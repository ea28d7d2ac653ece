"""Aggregate-arithmetic select items (the reference's AQP-283 shape).

``SELECT sum(fare_amount) / sum(trip_time_in_secs) ... WITH ERROR``
(CommonBugTest.scala:2666-2712) composes several aggregates with
arithmetic in ONE select item. The front-end splits such an item into its
component aggregate calls plus an arithmetic SKELETON, validates the
skeleton against a closed grammar (numbers, + - * /, parens, unary minus,
component holes), and emits a portable SQL TEMPLATE whose divisions are
CASE-guarded so a zero denominator yields NULL on Spark (ANSI mode raises
on /0) and DuckDB (returns NULL) alike.

The template's ``{i}`` holes are later formatted with context-specific
column texts: component OUTPUT aliases for the post-aggregation derived
item (point estimate on any estimator), per-trial ``__bv_`` columns for
the bootstrap CI path, and exact aggregate texts for the exact replica.

Anything outside the grammar (identifiers, function calls, CASE, strings)
is NOT a supported composite — the caller routes the query exactly, which
mirrors the reference's whole-query routing for unsupported shapes.
"""

from __future__ import annotations

import re

from ..dialect import dlit

_AGG_OPEN_RE = re.compile(r"\b(SUM|AVG|COUNT|MIN|MAX)\s*\(", re.IGNORECASE)

# one token: a number (int/decimal/scientific), a hole, an operator, a paren
_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<hole>\{\d+\})"
    r"|(?P<op>[-+*/()]))")


def split_agg_calls(text: str) -> tuple[str, list[tuple[str, str]]] | None:
    """Replace each aggregate call in ``text`` with a ``{i}`` hole.

    Returns ``(skeleton, [(fn, arg), ...])`` — fn lower-cased, arg the raw
    paren-balanced argument text — or None when ``text`` contains no
    aggregate call at all."""
    calls: list[tuple[str, str]] = []
    out: list[str] = []
    i = 0
    for m in _AGG_OPEN_RE.finditer(text):
        if m.start() < i:
            continue
        depth, j = 1, m.end()
        while j < len(text) and depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        if depth:
            return None                       # unbalanced: not parseable
        out.append(text[i:m.start()])
        out.append(f"{{{len(calls)}}}")
        calls.append((m.group(1).lower(), text[m.end():j - 1].strip()))
        i = j
    if not calls:
        return None
    out.append(text[i:])
    return "".join(out), calls


class _Parser:
    """recursive-descent over the tokenized skeleton; emits the guarded
    template bottom-up (no AST object needed)."""

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.pos = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expr(self) -> str:
        left = self.term()
        while self.peek() and self.peek()[1] in ("+", "-"):
            op = self.take()[1]
            left = f"({left} {op} {self.term()})"
        return left

    def term(self) -> str:
        left = self.factor()
        while self.peek() and self.peek()[1] in ("*", "/"):
            op = self.take()[1]
            right = self.factor()
            if op == "/":
                # NULL-safe division: ANSI Spark raises on /0, DuckDB
                # returns NULL — the guard makes both yield NULL
                left = (f"(CASE WHEN {right} = {dlit(0.0)} THEN NULL "
                        f"ELSE {left} / {right} END)")
            else:
                left = f"({left} * {right})"
        return left

    def factor(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        kind, val = t
        if kind == "op" and val == "-":
            self.take()
            return f"(- {self.factor()})"
        if kind == "op" and val == "(":
            self.take()
            inner = self.expr()
            nxt = self.peek()
            if nxt is None or nxt[1] != ")":
                raise ValueError("missing )")
            self.take()
            return f"({inner})"
        if kind == "num":
            self.take()
            # doubles on both engines: component values are DOUBLE already,
            # and a double literal keeps int-vs-double semantics identical
            return dlit(float(val))
        if kind == "hole":
            self.take()
            return val
        raise ValueError(f"unexpected token {val!r}")


def parse_template(skeleton: str, n_holes: int) -> str | None:
    """Validate the skeleton and emit the guarded template, or None when
    it falls outside the arithmetic grammar."""
    tokens: list[tuple[str, str]] = []
    i = 0
    while i < len(skeleton):
        m = _TOKEN_RE.match(skeleton, i)
        if m is None or m.end() == i:
            rest = skeleton[i:].strip()
            if not rest:
                break
            return None
        if m.group("num"):
            tokens.append(("num", m.group("num")))
        elif m.group("hole"):
            tokens.append(("hole", m.group("hole")))
        elif m.group("op"):
            tokens.append(("op", m.group("op")))
        i = m.end()
    try:
        p = _Parser(tokens)
        out = p.expr()
        if p.pos != len(tokens):
            return None
    except ValueError:
        return None
    for h in range(n_holes):
        if f"{{{h}}}" not in out:
            return None
    return out
