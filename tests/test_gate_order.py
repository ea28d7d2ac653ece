"""The driver's correctness gate checks ~50 fixtures per round in dict
order; ``_gate_order`` must (1) surface never-rowed fixtures first,
(2) re-gate fixtures whose latest driver row is red, (3) rotate the rest
stalest-first so the bounded window sweeps the whole set across rounds.

Round-5 VERDICT "What's wrong #1": the old implementation degenerated to
insertion order once every fixture had a row, permanently starving the
one red row (``sql_derived_agg_join``)."""

import json

import __spark_entry__ as entry


def test_red_rows_precede_green(tmp_path, monkeypatch):
    # synthesize a history: a=green r2, b=red r4, c=never rowed, d=green r3
    rec = {
        "CORRECTNESS_r02.json": {"a": {"rows_match": True, "schema_match": True,
                                       "hash_match": True, "err": None}},
        "CORRECTNESS_r03.json": {"d": {"rows_match": True, "schema_match": True,
                                       "hash_match": True, "err": None}},
        "CORRECTNESS_r04.json": {"b": {"rows_match": True, "schema_match": True,
                                       "hash_match": False, "err": None}},
    }
    for fn, payload in rec.items():
        (tmp_path / fn).write_text(json.dumps(payload))

    def fake_history():
        hist = {}
        import re
        for fn, payload in rec.items():
            rnd = int(re.search(r"r(\d+)", fn).group(1))
            for name, row in payload.items():
                green = (row["err"] is None and row["rows_match"]
                         and row["schema_match"] and row["hash_match"])
                prev = hist.get(name)
                if prev is None or rnd >= prev[0]:
                    hist[name] = (rnd, green)
        return hist

    monkeypatch.setattr(entry, "_driver_history", fake_history)
    out = {"a": 1, "b": 2, "c": 3, "d": 4}
    ordered = list(entry._gate_order(out))
    # never-rowed first, then red, then green stalest-first
    assert ordered == ["c", "b", "a", "d"]


def test_latest_row_wins(monkeypatch):
    # a fixture red in r3 but green in r4 must NOT be treated as red
    def fake_history():
        return {"x": (4, True), "y": (4, False)}

    monkeypatch.setattr(entry, "_driver_history", fake_history)
    ordered = list(entry._gate_order({"x": 1, "y": 2}))
    assert ordered == ["y", "x"]


def test_real_history_puts_red_first():
    """Against the repo's actual CORRECTNESS_r*.json files: any fixture
    whose latest row is red must lead the gate, and the first-50 window
    must be dominated by the stalest rounds."""
    q = entry.queries()
    hist = entry._driver_history()
    names = list(q)
    reds = [k for k in names if k in hist and not hist[k][1]]
    greens = [names.index(k) for k in names if k in hist and hist[k][1]]
    nevers = [names.index(k) for k in names if k not in hist]
    # every red row sits after the never-rowed block, before every green
    for r in reds:
        i = names.index(r)
        assert all(i > j for j in nevers), (r, i)
        assert all(i < j for j in greens), (r, i)
    # rotation: among green-rowed fixtures in the ordering, rounds ascend
    rowed = [hist[k][0] for k in names if k in hist and hist[k][1]]
    assert rowed == sorted(rowed)
