"""Dialect shims + stage runner for dual-emitted pipeline operators.

Pipeline operators (dedup, similarity) are declared once as CTE stage lists
in portable SQL with small dialect shims; the Spark path executes the full
query through ``spark.sql`` (one Catalyst-optimized plan over temp views),
the oracle path replays the identical stages on DuckDB. Zero drift by
construction.
"""

from __future__ import annotations

from ..dialect import DUCKDB, SPARK


def hint(dialect: str, h: str) -> str:
    """Spark-only optimizer hint (``/*+ BROADCAST(t) */``); empty text on
    DuckDB. Purely physical — the two dialects stay semantically identical,
    Spark just gets told which relations are query-time small (stats over
    temp-view stages are unknown, so Catalyst otherwise falls back to
    sort-merge joins for provably tiny probe sides)."""
    return f"/*+ {h} */ " if dialect == SPARK else ""


def order_nulls(items) -> str:
    """ORDER BY item list with the NULL placement made EXPLICIT (Spark
    defaults to NULLS FIRST on ASC / NULLS LAST on DESC; DuckDB defaults
    the other way around on both) — a nullable sort key would otherwise
    break the bit-exact dual-replay contract. Emits Spark's defaults as
    explicit suffixes, which both engines accept."""
    import re as _re
    out = []
    for o in items:
        if _re.search(r"NULLS\s+(FIRST|LAST)\s*$", o, _re.IGNORECASE):
            out.append(o)
        elif _re.search(r"\bDESC\s*$", o, _re.IGNORECASE):
            out.append(f"{o} NULLS LAST")
        else:
            out.append(f"{o} NULLS FIRST")
    return ", ".join(out)


def explode(dialect: str, arr_sql: str, alias: str) -> str:
    return (f"explode({arr_sql}) AS {alias}" if dialect == SPARK
            else f"unnest({arr_sql}) AS {alias}")


def transform(dialect: str, arr_sql: str, lam: str) -> str:
    return (f"transform({arr_sql}, {lam})" if dialect == SPARK
            else f"list_transform({arr_sql}, {lam})")


def sequence(dialect: str, lo: str, hi: str) -> str:
    return (f"sequence({lo}, {hi})" if dialect == SPARK
            else f"generate_series({lo}, {hi})")


def arr_distinct(dialect: str, arr_sql: str) -> str:
    return (f"array_distinct({arr_sql})" if dialect == SPARK
            else f"list_distinct({arr_sql})")


def arr_min(dialect: str, arr_sql: str) -> str:
    return (f"array_min({arr_sql})" if dialect == SPARK
            else f"list_min({arr_sql})")


def arr_len(dialect: str, arr_sql: str) -> str:
    return (f"size({arr_sql})" if dialect == SPARK
            else f"len({arr_sql})")


def array_lit(dialect: str, items: list[str]) -> str:
    body = ", ".join(items)
    return f"array({body})" if dialect == SPARK else f"[{body}]"


def arr_sum_bigint(dialect: str, arr_sql: str) -> str:
    if dialect == SPARK:
        return f"aggregate({arr_sql}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"CAST(list_sum({arr_sql}) AS BIGINT)"


def elem(dialect: str, arr_sql: str, idx_sql: str) -> str:
    if dialect == SPARK:
        return f"element_at({arr_sql}, CAST({idx_sql} AS INT))"
    return f"list_extract({arr_sql}, CAST({idx_sql} AS INT))"


def ascii_array(dialect: str, col: str) -> str:
    """string -> array of character codes, computed in one O(len) pass.

    Positional ``substring(col, i, 1)`` loops are O(len^2) per document
    (UTF-8 strings scan from the start for every call) — this is the O(len)
    replacement; downstream grams index the array in O(1)."""
    if dialect == SPARK:
        return f"transform(split({col}, ''), c -> ascii(c))"
    return f"list_transform(string_split({col}, ''), c -> ascii(c))"


def elem0(dialect: str, arr: str, idx: str, n: str) -> str:
    """1-based element access returning 0 out of bounds (ANSI-safe)."""
    return (f"(CASE WHEN ({idx}) <= ({n}) THEN {elem(dialect, arr, idx)} "
            f"ELSE 0 END)")


def empty_bigint_array(dialect: str) -> str:
    if dialect == SPARK:
        return "CAST(array() AS ARRAY<BIGINT>)"
    return "CAST([] AS BIGINT[])"


def bind_array(dialect: str, arr_sql: str, body_fn) -> str:
    """Evaluate ``arr_sql`` once per row and expose it as a lambda variable
    inside ``body_fn(var) -> sql``.

    Necessary because Catalyst collapses projections: referencing an
    array-valued column N times re-evaluates its defining expression N
    times (O(len^2) blowups for char arrays). Wrapping the array in a
    single-element array and a HOF binds it once."""
    inner = body_fn("__ba")
    if dialect == SPARK:
        return f"element_at(transform(array({arr_sql}), __ba -> {inner}), 1)"
    return f"list_extract(list_transform([{arr_sql}], __ba -> {inner}), 1)"


def gram_int_array(dialect: str, col: str, k: int,
                   coeffs: list[int] | None = None,
                   stride: int = 1) -> str:
    """array of k-gram integer codes for a string column, O(len·k) total.

    Default coefficients 257^j are injective for k <= 7; pass modular
    coefficients for longer grams. ``stride`` > 1 gives non-overlapping
    tokens (simhash). Documents shorter than k yield an empty array."""
    cs = coeffs or [257 ** j for j in range(k)]
    n_pos = (f"(CAST(FLOOR(CAST(length({col}) - {k} AS DOUBLE) "
             f"/ CAST({stride} AS DOUBLE)) AS BIGINT) + 1)")
    start = f"((i - 1) * {stride} + 1)"

    def body(a: str) -> str:
        terms = " + ".join(
            f"CAST({elem(dialect, a, f'{start} + {j}')} AS BIGINT) * {c}"
            for j, c in enumerate(cs))
        return transform(dialect, sequence(dialect, "1", n_pos),
                         f"i -> ({terms})")

    bound = bind_array(dialect, ascii_array(dialect, col), body)
    return (f"(CASE WHEN length({col}) >= {k} THEN {bound} "
            f"ELSE {empty_bigint_array(dialect)} END)")


def arr_max(dialect: str, arr_sql: str) -> str:
    return (f"array_max({arr_sql})" if dialect == SPARK
            else f"list_max({arr_sql})")


def arr_agg(dialect: str, col_sql: str) -> str:
    """aggregate rows into an array (grouping decided by the caller)."""
    return (f"collect_list({col_sql})" if dialect == SPARK
            else f"list({col_sql})")


def arr_intersect_len(dialect: str, a_sql: str, b_sql: str) -> str:
    """|A ∩ B| for two DISTINCT-element arrays, as BIGINT."""
    inner = (f"array_intersect({a_sql}, {b_sql})" if dialect == SPARK
             else f"list_intersect({a_sql}, {b_sql})")
    return f"CAST({arr_len(dialect, inner)} AS BIGINT)"


def arr_filter(dialect: str, arr_sql: str, lam: str) -> str:
    return (f"filter({arr_sql}, {lam})" if dialect == SPARK
            else f"list_filter({arr_sql}, {lam})")


def str_split(dialect: str, col_sql: str, sep_sql: str) -> str:
    """split a string on a literal separator expression (pass the separator
    via chr(...) — Spark string literals interpret C escapes, DuckDB's do
    not, so an escape like '\\n' is not portable text)."""
    return (f"split({col_sql}, {sep_sql})" if dialect == SPARK
            else f"string_split({col_sql}, {sep_sql})")


def arr_join(dialect: str, arr_sql: str, sep_sql: str) -> str:
    """join a string array with a separator."""
    return (f"array_join({arr_sql}, {sep_sql})" if dialect == SPARK
            else f"array_to_string({arr_sql}, {sep_sql})")


def arr_slice(dialect: str, arr_sql: str, start_sql: str, n_sql: str) -> str:
    """``n`` elements starting at 1-based ``start`` (shorter at the end)."""
    if dialect == SPARK:
        return f"slice({arr_sql}, {start_sql}, {n_sql})"
    return f"list_slice({arr_sql}, {start_sql}, ({start_sql}) + ({n_sql}) - 1)"


def mk_struct(dialect: str, fields: list[tuple[str, str]]) -> str:
    if dialect == SPARK:
        body = ", ".join(f"'{n}', {s}" for n, s in fields)
        return f"named_struct({body})"
    body = ", ".join(f"{n} := {s}" for n, s in fields)
    return f"struct_pack({body})"


def collect(dialect: str, val_sql: str) -> str:
    """unordered array aggregation (use only where downstream consumption is
    order-independent, e.g. an argmax fold)."""
    return (f"collect_list({val_sql})" if dialect == SPARK
            else f"list({val_sql})")


def ordered_list(dialect: str, val: str, order: str) -> str:
    """aggregate ``val`` into an array ordered by ``order`` (both column
    references; ``order`` must be unique within the group so the result is
    deterministic). Spark has no ordered array_agg — sort structs instead."""
    if dialect == SPARK:
        return (f"transform(sort_array(collect_list(struct({order}, {val}))), "
                f"x -> x.{val.split('.')[-1]})")
    return f"list({val} ORDER BY {order})"


def xor(dialect: str, a: str, b: str) -> str:
    return f"({a} ^ {b})" if dialect == SPARK else f"xor({a}, {b})"


def shiftright(dialect: str, a: str, n: str) -> str:
    return (f"shiftright({a}, {n})" if dialect == SPARK
            else f"(({a}) >> ({n}))")


def hex15_to_long(hex_sql: str, dialect: str) -> str:
    """first 15 hex chars of a hex string -> BIGINT < 2^60, parsed
    NATIVELY per engine — Spark ``conv(h, 16, 10)``, DuckDB
    ``CAST('0x' || h AS BIGINT)``: both are exact integer conversions of
    the same 15 lowercase hex digits, so the values are identical by
    construction. Until round 10 this was a single-text portable
    positional sum (15 substring/instr digit extractions PER ROW) — that
    form measured the Spark md5 path 2.3x slower than the DuckDB oracle
    at 600M rows and was removed outright; ``dialect`` is required so a
    future caller cannot silently fall back onto it."""
    if dialect == SPARK:
        return (f"CAST(conv(substring({hex_sql}, 1, 15), 16, 10) "
                f"AS BIGINT)")
    if dialect == DUCKDB:
        return f"CAST(('0x' || substring({hex_sql}, 1, 15)) AS BIGINT)"
    raise ValueError(f"unknown dialect: {dialect!r}")


# ---- Mersenne-61 avalanche row hash (portable, integer-only) ----------
#
# The md5-based row hash (hex15_to_long(md5(CAST(col AS STRING)))) is
# bit-exact across engines but pays a cryptographic hash + a string cast +
# 15 substring/instr digit extractions PER ROW — at 100-TB scan scale that
# is the dominant CPU bill of the HLL route (round-8 VERDICT: grouped HLL
# 2.7x slower than the DuckDB oracle, almost all hash CPU). For keys that
# render as BIGINT the chain below replaces it with pure * + % & ^ >>
# arithmetic in the Mersenne field 2^61-1, mirroring splitmix64's
# finalizer (two multiply rounds with interleaved xor-shifts). Every
# intermediate stays below 2^63, so it is safe under Spark 4 ANSI mode and
# evaluates verbatim (via the tiny shims) on DuckDB. Empirical avalanche
# 0.46-0.55 per output bit; HLL error at the 1.04/sqrt(m) bound (pinned
# by the statistical sweep in tests/test_accuracy.py).

M61 = (1 << 61) - 1
_AV_MUL1 = 0x6C8E9CF5            # odd 31-bit multipliers (measured
_AV_MUL2 = 0x2545F491            # avalanche 0.46-0.55 with the shifts below)
_POLY_B = 1000003                # string_poly fold base (odd, < 2^31)


def xorshr(dialect: str, x: str, n: int) -> str:
    """x XOR (x >> n). ``x`` is referenced twice — pass a plain column."""
    return xor(dialect, f"({x})", shiftright(dialect, f"({x})", str(n)))


def mulmod61(dialect: str, x: str, c: int) -> str:
    """(x * c) mod (2^61 - 1) for x in [0, 2^61) and constant c < 2^31.

    Limb derivation: x = xh*2^31 + xl gives x*c = (xh*c)*2^31 + xl*c, and
    for t = xh*c < 2^61, t*2^31 ≡ (t mod 2^30)*2^31 + (t >> 30) (mod M)
    because 2^61 ≡ 1 (mod M). Max intermediate < 2^63 (ANSI-safe).
    ``x`` is referenced ~16 times after textual expansion — pass a plain
    column reference (stage the expression first, as avalanche60_steps
    does)."""
    if not 0 < c < (1 << 31):
        raise ValueError(f"multiplier out of 31-bit range: {c}")
    xh = shiftright(dialect, f"({x})", "31")
    xl = f"((({x}) & {(1 << 31) - 1}))"
    t = f"({xh} * {c})"
    th = shiftright(dialect, t, "30")
    tl = f"(({t} & {(1 << 30) - 1}))"
    s = f"({th} + {shiftleft(dialect, tl, '31')} + {xl} * {c})"
    s1 = f"(({s} & {M61}) + {shiftright(dialect, s, '61')})"
    return f"(CASE WHEN {s1} >= {M61} THEN {s1} - {M61} ELSE {s1} END)"


def avalanche60_steps(dialect: str, key_sql: str) -> list[tuple[str, str]]:
    """Chained projection steps computing a 60-bit avalanche hash of a
    BIGINT-valued ``key_sql``: ``[(col, expr)]`` where the first expr
    references ``key_sql`` and each later expr references the PREVIOUS
    step's column; the last column holds the hash in [0, 2^60) — the same
    range contract as ``hex15_to_long``, so the HLL lattice math is
    unchanged. Callers must emit each step as its own projection (CTE
    stage or nested subquery): mulmod61 expands its input ~16x, so
    composing the rounds textually would blow up the SQL.

    Structural property (round-9 ADVICE): the first fold reduces the key
    mod 2^61-1, so any two keys congruent mod 2^61-1 (e.g. 0 vs 2^61-1,
    -1 vs 2^61-2) hash IDENTICALLY — a deterministic collision class,
    unlike md5's ~2^-60 random collisions. Harmless for realistic key
    ranges (ids, epoch micros, epoch days all sit far below 2^61) and
    acceptable for an approximate sketch, but callers hashing adversarial
    full-range 64-bit keys should use key_kind='string' (md5)."""
    fold = f"(((({key_sql}) % {M61}) + {M61}) % {M61})"
    return [
        ("__av0", fold),
        ("__av1", mulmod61(dialect, xorshr(dialect, "__av0", 30), _AV_MUL1)),
        ("__av2", mulmod61(dialect, xorshr(dialect, "__av1", 27), _AV_MUL2)),
        ("__av3", f"({xorshr(dialect, '__av2', 31)} & {(1 << 60) - 1})"),
    ]


def to_bigint_key(dialect: str, expr: str, kind: str) -> str:
    """Portable BIGINT rendering of a hashable key expression, by type
    kind: 'bigint' (any integral/boolean), 'timestamp' / 'timestamp_ntz'
    (epoch micros), 'date' (epoch days), 'string_poly' (opt-in
    polynomial code-point fold — see inline note). Identical values on
    Spark and DuckDB (NTZ goes through timestampdiff from the NTZ epoch —
    timezone-independent, matching DuckDB's naive epoch_us; same policy
    as topk.api._time_us).

    CAVEAT ('timestamp', i.e. TIMESTAMP_LTZ): the fold hashes the
    ABSOLUTE instant (unix_micros). That is the right Spark-side
    semantic, but a bit-exact DuckDB replay additionally requires the
    oracle to read the same instants — naive parquet timestamps read as
    LTZ (NTZ inference disabled) under a non-UTC session timezone would
    shift Spark's instants relative to DuckDB's naive epoch_us. The
    repo's fixtures read naive parquet under Spark 4's default NTZ
    inference, which lands on the 'timestamp_ntz' kind and is
    timezone-independent by construction. Since round 10 the assumption
    is ENFORCED at the route gate, not just documented: the type probe
    (api.AQPSession._hll_key_kind) only selects this kind when the
    session timezone is UTC, and maps LTZ keys to 'string' otherwise."""
    if kind == "bigint":
        return f"CAST({expr} AS BIGINT)"
    if kind == "string_poly":
        # polynomial fold over the character code points in the Mersenne
        # field: acc = (acc * B + c) mod (2^61-1), one O(len) lambda pass
        # (list_reduce has no init on DuckDB — prepend the seed). The
        # fold alone has structured low bits (the last character
        # dominates), so it MUST feed the avalanche chain like every
        # other integer kind — never the HLL lattice directly. Collision
        # class: distinct strings collide with probability <= len/2^61
        # (random polynomial root), vs md5's ~2^-60 — both negligible
        # for sketch use. Round-10 A/B OUTCOME (PLANS.md): LOSES to md5
        # decisively — 14x slower on Spark, 7x on DuckDB at 30M rows
        # (per-char HOF lambda over the ~16x-expanded mulmod61 vs one
        # native md5 intrinsic per row) — so the string default stays
        # md5; this kind stays opt-in-only (never auto-probed) to keep
        # the A/B (scripts/ab_string_hash.py) reproducible.
        lam = f"((({mulmod61(dialect, 'a', _POLY_B)}) + b) % {M61})"
        if dialect == SPARK:
            return (f"aggregate(transform(split({expr}, ''), "
                    f"c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT), "
                    f"(a, b) -> {lam})")
        return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform(string_split({expr}, ''), "
                f"c -> CAST(ascii(c) AS BIGINT))), (a, b) -> {lam})")
    if kind == "timestamp":
        return (f"unix_micros({expr})" if dialect == SPARK
                else f"epoch_us({expr})")
    if kind == "timestamp_ntz":
        return (f"timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ'1970-01-01 00:00:00', ({expr}))"
                if dialect == SPARK else f"epoch_us({expr})")
    if kind == "date":
        if dialect == SPARK:
            return f"CAST(datediff({expr}, DATE '1970-01-01') AS BIGINT)"
        return f"CAST(datediff('day', DATE '1970-01-01', {expr}) AS BIGINT)"
    raise ValueError(f"not an integer-key kind: {kind!r}")


def idiv(dialect: str, a: str, b: str) -> str:
    """integer division (both operands BIGINT)."""
    return f"(({a}) DIV ({b}))" if dialect == SPARK else f"(({a}) // ({b}))"


def fdiv(dialect: str, a: str, b: str) -> str:
    """FLOOR integer division for a positive divisor: idiv truncates
    toward zero in both engines, which mis-bins negative dividends
    (-150 DIV 200 = 0, not -1). All-integer, no double round-trip."""
    q = idiv(dialect, a, b)
    return f"({q} - (CASE WHEN (({a}) % ({b})) < 0 THEN 1 ELSE 0 END))"


def shiftleft(dialect: str, a: str, n: str) -> str:
    return (f"shiftleft({a}, CAST({n} AS INT))" if dialect == SPARK
            else f"(({a}) << ({n}))")


def band(dialect: str, a: str, b: str) -> str:
    """bitwise AND (same operator, kept as a shim for symmetry)."""
    return f"(({a}) & ({b}))"


def raise_err(dialect: str, msg: str) -> str:
    """BIGINT-typed expression that raises ``msg`` when evaluated (guard
    rails inside CASE branches; both engines evaluate CASE lazily)."""
    lit = "'" + msg.replace("'", "''") + "'"
    fn = "raise_error" if dialect == SPARK else "error"
    return f"CAST({fn}({lit}) AS BIGINT)"


def stages_sql(stages: list[tuple[str, str]], final: str,
               materialized: bool = False) -> str:
    """``materialized=True`` emits ``AS MATERIALIZED`` CTEs — DuckDB-only
    syntax for DuckDB-only oracles. Without it DuckDB inlines CTEs into a
    recursive closure's iteration, re-evaluating the (expensive) pair
    lineage per step: the embedding-clusters oracle drops 22.3s -> 2.3s at
    sf0.001 with identical results. Never set for SQL that Spark runs."""
    if not stages:
        return final
    kw = "AS MATERIALIZED" if materialized else "AS"
    ctes = ",\n".join(f"{n} {kw} (\n{s}\n)" for n, s in stages)
    return f"WITH {ctes}\n{final}"


# repeat-call stage cache, bounded to the LATEST pipeline: persisted
# stage DataFrames plus the (stages, final) text that produced them.
# Re-running the SAME pipeline (bench iterations, interactive re-runs)
# keeps its persisted stages — Spark's CacheManager matches the identical
# analyzed plans, so repeat executions skip the expensive early stages,
# exactly the approx side's _PLAN_CACHE philosophy. Running a DIFFERENT
# pipeline evicts the old one first, so the block manager never
# accumulates more than one pipeline's intermediates (previously a
# single sf0.1 shingle explosion parked GBs forever).
#
# INDEX stages (*_ix — query-independent corpus artifacts like BM25
# posting lists) cache PER STAGE instead: keyed by the stage's
# ``semanticHash()`` — the canonicalized ANALYZED plan, which resolves
# transitively through the current temp-view bindings down to the file
# locations — so a NEW query over the same index reuses it (round-8
# ADVICE: the whole-pipeline key evicted the index on every new
# query_pred, defeating the 'build once, probe many' split), while a
# REBOUND source table (same SQL text, different sf_dir) misses and
# rebuilds instead of serving stale rows. One entry per index name; a
# changed binding unpersists the stale one.
_PREV_PERSISTED: list = []
_PREV_KEY: list = [None]
_IX_CACHE: dict[str, tuple] = {}     # name -> (semantic_hash, persisted df)
# Prepared-plan slot (round 10): analyzing a 10-20 stage pipeline whose
# expressions carry dim-wide HOF folds costs 0.3-0.8 s of DRIVER time per
# call — measured as the gap before the first job of a warm
# semantic_dedup iteration. Repeat calls of the SAME pipeline (bench
# iterations, interactive re-runs) reuse the analyzed final DataFrame —
# the exact philosophy of the approx side's _PLAN_CACHE (and of the
# bench's exact_cached twin). Guards: the slot is keyed by the FULL stage
# text plus the caller's binding token (the sf_dir — a rebound source
# dir is a different key), holds the owning session, and only serves
# while _PREV_KEY still matches (a different pipeline in between evicted
# the persisted stage views, so the plan must be rebuilt). A plan is not
# a result: every execution still computes from the bound inputs.
_FINAL_SLOT: list = [None]           # (cache_token, key, spark, final_df)


def run_stages(spark, stages: list[tuple[str, str]], final: str,
               cache_token: str | None = None):
    """Execute the stage list on Spark.

    Spark inlines CTE/view references, so a stage referenced N times is
    recomputed N times — ruinous for expensive stages like shingle
    explosion. Stages referenced more than once downstream are therefore
    materialized (persisted temp view) before the rest of the plan runs;
    DuckDB materializes CTEs natively, so semantics stay identical.
    """
    import re as _re
    key = (tuple(stages), final)
    slot = _FINAL_SLOT[0]
    if (cache_token is not None and slot is not None
            and slot[0] == cache_token and slot[1] == key
            and slot[2] is spark and _PREV_KEY[0] == key):
        # .select("*") wraps the stored ANALYZED plan in a fresh Dataset:
        # analysis is skipped, but the new QueryExecution re-plans and
        # RE-EXECUTES every shuffle stage on each call. Returning the
        # stored DataFrame itself would let AQE serve its already
        # materialized query stages — repeat timings would then measure
        # only the result stage, which is result caching, not plan reuse.
        return slot[3].select("*")
    if _PREV_KEY[0] != key:
        for old in _PREV_PERSISTED:
            old.unpersist()
        _PREV_PERSISTED.clear()
        _PREV_KEY[0] = key
    texts = [s for _, s in stages] + [final]
    persisted = []
    for i, (name, _) in enumerate(stages):
        later = " ".join(texts[i + 1:])
        # multi-referenced stages persist (inlining re-evaluates them per
        # reference); stages named *_ix persist unconditionally — they are
        # INDEX stages (corpus-side artifacts like posting lists) that a
        # repeat caller must reuse even when the query path references
        # them only once; stages named *_mz persist unconditionally with
        # the ordinary pipeline-scoped lifecycle — they are MATERIALIZE
        # stages a builder marks when its final's global ORDER BY would
        # otherwise evaluate the stage twice (range-bound sampling + the
        # sort itself) AND logically eliminate any repartition below the
        # sort (a repartition under a global Sort is provably redundant to
        # the optimizer, which strips it together with the stage's
        # parallelism)
        if (name.endswith(("_ix", "_mz"))
                or len(_re.findall(rf"\b{name}\b", later)) > 1):
            persisted.append(name)

    if not persisted:
        out = spark.sql(stages_sql(stages, final))
        if cache_token is not None:
            _FINAL_SLOT[0] = (cache_token, key, spark, out)
        return out

    for name, sql in stages:
        df = spark.sql(sql)            # references earlier stages as views
        if name.endswith("_ix"):
            ck = df.semanticHash()     # binding-sensitive: views + files
            hit = _IX_CACHE.get(name)
            if hit is not None:
                same = hit[0] == ck
                if same:
                    # semanticHash is 32-bit — confirm with the exact
                    # (analysis-only) plan comparison so a hash collision
                    # can never serve stale index rows; a cached df whose
                    # owning session was stopped raises here and falls
                    # through to a rebuild (round-8 ADVICE)
                    try:
                        same = df.sameSemantics(hit[1])
                    except Exception:
                        same = False
                if same:
                    hit[1].createOrReplaceTempView(name)
                    continue
                try:
                    hit[1].unpersist()
                except Exception:
                    pass               # dead session: nothing to free
                _IX_CACHE.pop(name, None)
            df = df.persist()
            _IX_CACHE[name] = (ck, df)
        elif name in persisted:
            df = df.persist()
            _PREV_PERSISTED.append(df)
        df.createOrReplaceTempView(name)
    out = spark.sql(final)
    if cache_token is not None:
        _FINAL_SLOT[0] = (cache_token, key, spark, out)
    return out
