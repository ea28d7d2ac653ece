"""Similarity search over embedding columns.

  * brute-force cosine top-k — the exact baseline: queries x corpus with a
    JVM-side higher-order dot product (zip_with/aggregate), ranked per
    query by a window. At 100 TB this is the broadcast-join pattern:
    a small query set against a huge corpus scan, no shuffle of the corpus.
  * LSH-bucketed top-k — the scale path: random-hyperplane signatures
    bucket the corpus (one cheap projection scan); candidates come from a
    bucket equi-join (AQE-sized), then exact cosine re-ranks candidates.

Embeddings are quantized to integers (floor(x * 2^16)) before any
arithmetic: dot products and norms become exact BIGINTs, so results are
identical across engines and partitionings — same reproducible-mode design
as the AQP aggregates (quant.py). Declared as dual-dialect CTE stages.
"""

from __future__ import annotations

from . import dual
from ..dialect import SPARK

P31 = 2147483647
_SCALE = 65536.0          # 2^16: 64 dims x (2^16)^2 fits comfortably in BIGINT


def _quantize(dialect: str, arr: str, dim: int) -> str:
    lam = (f"i -> CAST(FLOOR(CAST({dual.elem(dialect, arr, 'i')} AS DOUBLE) "
           f"* CAST('{_SCALE!r}' AS DOUBLE)) AS BIGINT)")
    return dual.transform(dialect, dual.sequence(dialect, "1", str(dim)), lam)


def _dot(dialect: str, a: str, b: str, dim: int) -> str:
    if dialect == SPARK:
        return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    return (f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> list_extract({a}, i) * list_extract({b}, i))) AS BIGINT)")


def _norm2(dialect: str, a: str, dim: int) -> str:
    return _dot(dialect, a, a, dim)


def _cos(dot: str, n2a: str, n2b: str) -> str:
    return (f"(CASE WHEN {n2a} = 0 OR {n2b} = 0 THEN CAST('0.0' AS DOUBLE) "
            f"ELSE CAST({dot} AS DOUBLE) / "
            f"SQRT(CAST({n2a} AS DOUBLE) * CAST({n2b} AS DOUBLE)) END)")


def _vec_stage(dialect: str, table: str, dim: int) -> tuple[str, str]:
    q = _quantize(dialect, "embedding", dim)
    return ("__vec", f"SELECT vec_id, {q} AS v, "
                     f"{_norm2(dialect, q, dim)} AS n2 FROM {table}")


def brute_force_topk_stages(dialect: str, n_queries: int = 20, k: int = 5,
                            dim: int = 64, table: str = "embeddings"
                            ) -> tuple[list[tuple[str, str]], str]:
    stages = [
        _vec_stage(dialect, table, dim),
        ("__qs", f"SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM __vec "
                 f"WHERE vec_id < {n_queries}"),
        ("__sim", f"SELECT q.qid, a.vec_id AS vid, "
                  f"{_cos(_dot(dialect, 'q.qv', 'a.v', dim), 'q.qn2', 'a.n2')} "
                  f"AS cos FROM __qs q JOIN __vec a ON a.vec_id <> q.qid"),
        ("__rk", "SELECT qid, vid, cos, ROW_NUMBER() OVER "
                 "(PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rank "
                 "FROM __sim"),
    ]
    final = (f"SELECT qid, vid, CAST(rank AS BIGINT) AS rank, cos "
             f"FROM __rk WHERE rank <= {k} ORDER BY qid, rank")
    return stages, final


def cosine_pairs_stages(dialect: str, threshold: float = 0.95, dim: int = 64,
                        table: str = "embeddings"
                        ) -> tuple[list[tuple[str, str]], str]:
    """embedding-cosine near-duplicate pairs (dedup flavor): all pairs with
    cosine >= threshold. The quadratic baseline; LSH buckets are the scale
    path (lsh_topk_stages)."""
    from ..dialect import dlit
    stages = [
        _vec_stage(dialect, table, dim),
        ("__pairs", f"SELECT a.vec_id AS ida, b.vec_id AS idb, "
                    f"{_cos(_dot(dialect, 'a.v', 'b.v', dim), 'a.n2', 'b.n2')} "
                    f"AS cos FROM __vec a JOIN __vec b ON a.vec_id < b.vec_id"),
    ]
    final = (f"SELECT ida, idb, cos FROM __pairs "
             f"WHERE cos >= {dlit(threshold)} ORDER BY ida, idb")
    return stages, final


def _lsh_bucket(dialect: str, vec: str, dim: int, planes: int) -> str:
    """random-hyperplane signature: plane weights ±1 from integer hashing."""
    bits = []
    for j in range(planes):
        w = (f"x -> CASE WHEN ((1103515245 * CAST({j * dim} + i AS BIGINT) "
             f"+ 12345) % {P31}) % 2 = 1 THEN x ELSE -x END")
        lam = (f"i -> (CASE WHEN ((1103515245 * CAST({j * dim} AS BIGINT) + i * 1299709 "
               f"+ 12345) % {P31}) % 2 = 1 THEN {dual.elem(dialect, vec, 'i')} "
               f"ELSE -{dual.elem(dialect, vec, 'i')} END)")
        proj = dual.arr_sum_bigint(
            dialect, dual.transform(dialect, dual.sequence(dialect, "1", str(dim)), lam))
        bits.append(f"(CASE WHEN {proj} >= 0 THEN {2 ** j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def lsh_topk_stages(dialect: str, n_queries: int = 20, k: int = 3,
                    dim: int = 64, planes: int = 6,
                    table: str = "embeddings"
                    ) -> tuple[list[tuple[str, str]], str]:
    stages = [
        _vec_stage(dialect, table, dim),
        ("__sig", f"SELECT vec_id, v, n2, {_lsh_bucket(dialect, 'v', dim, planes)} "
                  f"AS bucket FROM __vec"),
        ("__qs", f"SELECT vec_id AS qid, v AS qv, n2 AS qn2, bucket FROM __sig "
                 f"WHERE vec_id < {n_queries}"),
        ("__cand", "SELECT q.qid, a.vec_id AS vid, q.qv, q.qn2, a.v, a.n2 "
                   "FROM __qs q JOIN __sig a ON a.bucket = q.bucket "
                   "AND a.vec_id <> q.qid"),
        ("__sim", f"SELECT qid, vid, "
                  f"{_cos(_dot(dialect, 'qv', 'v', dim), 'qn2', 'n2')} AS cos "
                  f"FROM __cand"),
        ("__rk", "SELECT qid, vid, cos, ROW_NUMBER() OVER "
                 "(PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rank "
                 "FROM __sim"),
    ]
    final = (f"SELECT qid, vid, CAST(rank AS BIGINT) AS rank, cos "
             f"FROM __rk WHERE rank <= {k} ORDER BY qid, rank")
    return stages, final
