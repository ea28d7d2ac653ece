"""Document chunking: split long documents into fixed-size overlapping
windows — the step that turns a cleaned corpus into training/RAG-sized
pieces.

Embarrassingly parallel by design: each document computes its own chunk
index list (a ``sequence`` over ceil((len-overlap)/stride) positions) and
explodes — no shuffle at all until a downstream consumer aggregates. The
final presentation sort is the only Exchange in the plan.

Char-based windows here; a token-based variant is the same plan over the
token-count column (``pipeline/text.py`` provides the counts). Chunks are
1-based substrings — identical semantics in Spark and DuckDB, so the
chunk text itself is part of the bit-exact oracle contract.
"""

from __future__ import annotations

from .dual import explode, idiv, sequence


def chunk_documents_stages(dialect: str, window: int = 400,
                           overlap: int = 50, table: str = "documents",
                           col: str = "text"
                           ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per chunk: (doc_id, chunk_idx,
    chunk_start, chunk_len, chunk_text). Every document yields at least
    one chunk (possibly shorter than ``window``); consecutive chunks
    overlap by ``overlap`` chars; the last chunk is never a sliver that
    the previous chunk already fully covers."""
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    stride = window - overlap
    # number of stride steps whose window still adds new content:
    # ceil(max(len - overlap, 1) / stride) via integer arithmetic
    n_chunks = (f"GREATEST(CAST(1 AS BIGINT), CAST("
                + idiv(dialect,
                       f"GREATEST(length({col}) - {overlap}, 1) + {stride} - 1",
                       str(stride))
                + " AS BIGINT))")
    idxs = sequence(dialect, "CAST(0 AS BIGINT)", "nc - 1")
    stages = [
        ("__chn", f"SELECT doc_id, {col}, {n_chunks} AS nc FROM {table}"),
        ("__che", f"SELECT doc_id, {col} AS t, "
                  f"{explode(dialect, idxs, 'chunk_idx')} FROM __chn"),
    ]
    final = (f"SELECT doc_id, chunk_idx, "
             f"chunk_idx * {stride} + 1 AS chunk_start, "
             f"CAST(length(substring(t, CAST(chunk_idx * {stride} + 1 AS INT), "
             f"{window})) AS BIGINT) AS chunk_len, "
             f"substring(t, CAST(chunk_idx * {stride} + 1 AS INT), {window}) "
             f"AS chunk_text "
             f"FROM __che ORDER BY doc_id, chunk_idx")
    return stages, final
