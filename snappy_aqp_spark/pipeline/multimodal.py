"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Binary media live as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the plumbing (schemas, batching,
partitioning) is real and tested, and every batch body is vectorized numpy
(no per-row Python loops). The actual codec is STUBBED: this container has
no image/audio libraries, so ``decode_fn="fake"`` derives a deterministic
pixel buffer from the content via pure integer arithmetic, and
``decode_fn="real"`` raises ``NotImplementedError`` where a PIL/ffmpeg call
would plug in.

The fake codec is deliberately *SQL-computable*: pixel(i) is a counter-based
LCG over (content-hash seed, frame, i) in BIGINT-safe modular arithmetic, so
``multimodal_oracle_sql`` replays the entire decode -> resize -> features
pipeline inside DuckDB and the driver can hash-compare values exactly.

Scale design: media blobs never shuffle — every stage is mapInPandas over
the scan partitioning; only extracted features (small fixed-size vectors)
flow into joins/aggregations downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..dialect import DUCKDB, dlit
from . import dual

MEDIA_SCHEMA = ("id bigint, content binary, format string, "
                "width int, height int, n_frames int")

_DECODED_SCHEMA = ("id bigint, frame int, width int, height int, "
                   "pixels array<int>")
_FEATURE_SCHEMA = ("id bigint, frame int, mean_px double, std_px double, "
                   "p_low double, p_high double")

# all arithmetic stays below 2^62: safe under Spark 4 ANSI mode and int64
_P31 = 2147483647          # 2^31 - 1
_MUL = 1103515245          # classic LCG multiplier, < 2^31
_INC = 12345
_FMIX = 179424673          # frame mixer (prime)
_IMIX = 2654435761         # pixel-counter mixer (Knuth 2^32 golden ratio)


def synthesize_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n_frames: int = 1,
                     width: int = 16, height: int = 16) -> DataFrame:
    """Deterministic binary media column from any string column (test
    harness for the pipeline; real deployments read binary parquet)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("fake/raw").alias("format"),
        F.lit(width).alias("width"), F.lit(height).alias("height"),
        F.lit(n_frames).alias("n_frames"))


def _content_seed(content: bytes) -> int:
    """position-weighted code-point hash of the content, mod 2^31-1.

    Matches ``_seed_sql`` exactly: code point of character k (1-based)
    weighted by ((k*k) % 64) + 1. utf-32-le round-trip vectorizes the
    per-character ord()."""
    codes = np.frombuffer(bytes(content).decode("utf-8").encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    if codes.size == 0:
        return 0
    k = np.arange(1, codes.size + 1, dtype=np.int64)
    w = (k * k) % 64 + 1
    return int((codes * w).sum() % _P31)


def _pixels(seeds: np.ndarray, frames: np.ndarray, n_px: int) -> np.ndarray:
    """(rows,) seeds + (rows,) frames -> (rows, n_px) uint8-range pixels.

    Counter-based two-step LCG; identical formula to ``_px_sql``."""
    i = np.arange(n_px, dtype=np.int64)[None, :]
    s1 = (seeds[:, None] + (frames[:, None] + 1) * _FMIX
          + (i + 1) * _IMIX) % _P31
    s2 = (s1 * _MUL + _INC) % _P31
    s3 = (s2 * _MUL + _INC) % _P31
    return s3 % 256


def available_codecs() -> dict[str, str]:
    """Feature-detect real media libraries in this environment.

    Returns e.g. ``{"image": "PIL", "video": "ffmpeg"}``; empty when neither
    is installed (this container ships none — the fake codec is the tested
    path)."""
    found: dict[str, str] = {}
    try:
        import PIL  # noqa: F401  (optional, detected only)
        found["image"] = "PIL"
    except ImportError:
        pass
    import shutil
    if shutil.which("ffmpeg"):
        found["video"] = "ffmpeg"
    return found


# Extension contract for real decoders (``decode_fn=<callable>``): the
# callable receives one pandas batch with MEDIA_SCHEMA columns
# (id, content, format, width, height, n_frames) plus the frame-sampling
# stride, and must return a pandas frame with _DECODED_SCHEMA columns
# (id, frame, width, height, pixels: list[int] of width*height values).
# It runs Arrow-batched inside mapInPandas — vectorize, never per-row.
_REAL_DECODERS: dict[str, object] = {}


def register_real_decoder(name: str, fn) -> None:
    """Install a real codec (PIL/ffmpeg-backed) under ``decode_fn=name``."""
    _REAL_DECODERS[name] = fn


def pil_image_decoder(pdf, stride: int):
    """Reference implementation of the extension contract for REAL image
    bytes via PIL: decode ``content`` (any PIL-readable format), convert to
    grayscale, emit one frame-0 pixel row per image (still images have one
    frame; ``stride`` is a documented no-op — this decoder is IMAGE-ONLY.
    Multi-frame containers go through ``ppm_image_decoder``'s stride loop
    or an ffmpeg-backed decoder). Ships permanently so
    the first environment WITH PIL proves the real-codec contract without
    code changes (tests/test_pipeline.py, marker-skipped here):

        register_real_decoder("pil", pil_image_decoder)
        decode_media(media, decode_fn="pil")

    Vectorized per Arrow batch; the per-image decode loop is the codec
    itself, not row-at-a-time Spark work."""
    import io
    import numpy as np
    import pandas as pd
    from PIL import Image
    rows = []
    for r in pdf.itertuples():
        img = Image.open(io.BytesIO(r.content)).convert("L")
        px = np.asarray(img, dtype=np.int64)
        rows.append({"id": int(r.id), "frame": 0,
                     "width": int(img.width), "height": int(img.height),
                     "pixels": px.reshape(-1).tolist()})
    return pd.DataFrame(rows, columns=["id", "frame", "width", "height",
                                       "pixels"])


def encode_ppm_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", width: int = 8,
                     height: int = 8, n_frames: int = 1) -> DataFrame:
    """REAL image bytes: binary-PPM (P6) frames per row, RGB channels
    derived deterministically from the text's content seed (r = LCG pixel
    for that frame, g = (r+85)%256, b = (r+170)%256 — three DISTINCT
    channels, so decoding must genuinely parse the header and
    de-interleave the binary payload). ``n_frames > 1`` concatenates N
    header+payload frames into one content blob (a minimal raw video
    container) so the real decoder's frame-stride branch can be exercised.
    This is the test-harness encoder; real deployments read media files."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "content", "format", "width", "height", "n_frames"]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            seeds = np.fromiter(
                (_content_seed(t.encode("utf-8")) for t in pdf[text_col]),
                dtype=np.int64, count=len(pdf))
            head = f"P6\n{width} {height}\n255\n".encode("ascii")
            parts: list[list[bytes]] = [[] for _ in range(len(pdf))]
            for f in range(n_frames):
                r = _pixels(seeds, np.full(len(pdf), f, dtype=np.int64),
                            width * height)
                rgb = np.empty((len(pdf), width * height, 3), dtype=np.uint8)
                rgb[:, :, 0] = r
                rgb[:, :, 1] = (r + 85) % 256
                rgb[:, :, 2] = (r + 170) % 256
                for t in range(len(pdf)):
                    parts[t].append(head + rgb[t].tobytes())
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(np.int64),
                "content": [b"".join(p) for p in parts],
                "format": ("image/x-portable-pixmap" if n_frames == 1
                           else "video/x-raw-ppm"),
                "width": width, "height": height, "n_frames": n_frames})
    return df.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _parse_pnm_header(data: bytes, pos: int) -> tuple[str, int, int, int]:
    """Parse one binary-PNM header at ``pos``: magic + 3 ints with '#'
    comments and any whitespace between. Returns (magic, width, height,
    payload_start)."""
    magic = data[pos:pos + 2].decode("ascii")
    if magic not in ("P5", "P6"):
        raise ValueError(f"not a binary PPM/PGM: magic {magic!r}")
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        while data[pos] in b" \t\r\n":
            pos += 1
        if data[pos:pos + 1] == b"#":
            while data[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while data[pos] not in b" \t\r\n":
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1                           # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return magic, w, h, pos


def ppm_image_decoder(pdf, stride: int):
    """REAL zero-dependency codec implementing the extension contract:
    parses binary PPM (P6) / PGM (P5) — magic, whitespace/comment-tolerant
    header (width, height, maxval), raw payload — and emits grayscale
    pixels (P6 luma = (r+g+b)//3, exact integer math so the result is
    SQL-replayable; P5 passes through). Multi-frame containers (N
    concatenated header+payload frames, ``encode_ppm_video``) decode to
    one row per KEPT frame: ``stride`` keeps container frames 0, stride,
    2*stride, ... — the real-codec twin of the fake codec's
    ``sample_every`` semantics. Registered permanently as decode_fn="ppm":
    the real-decoder branch of decode_media runs against a DuckDB oracle
    in every environment, not just ones with PIL (reference analog:
    arbitrary-typed columns through the sampler,
    stratifiedSampling.scala:55-63 schema carry-through; time-sampled
    ingestion, TopKWrapper.scala:45-51 CastLongTime)."""
    stride = max(1, int(stride))
    rows = []
    for r in pdf.itertuples():
        data = bytes(r.content)
        pos, fidx = 0, 0
        while pos < len(data):
            magic, w, h, pos = _parse_pnm_header(data, pos)
            nbytes = w * h * (3 if magic == "P6" else 1)
            if fidx % stride == 0:
                payload = np.frombuffer(data, dtype=np.uint8, offset=pos,
                                        count=nbytes)
                if magic == "P6":
                    rgb = payload.reshape(-1, 3).astype(np.int64)
                    px = (rgb[:, 0] + rgb[:, 1] + rgb[:, 2]) // 3
                else:
                    px = payload.astype(np.int64)
                rows.append({"id": int(r.id), "frame": fidx, "width": w,
                             "height": h, "pixels": px.tolist()})
            pos += nbytes
            fidx += 1
    return pd.DataFrame(rows, columns=["id", "frame", "width", "height",
                                       "pixels"])


def decode_media(df: DataFrame, decode_fn="fake",
                 sample_every: int = 1) -> DataFrame:
    """content -> per-frame pixel rows; ``sample_every`` keeps every n-th
    frame (video frame sampling).

    ``decode_fn``: "fake" (deterministic SQL-replayable codec), a callable
    implementing the extension contract above, or the name of a decoder
    registered via ``register_real_decoder`` ("real" is the conventional
    name). Unresolvable names fail here at plan time, not inside executors.
    """
    custom = decode_fn if callable(decode_fn) else _REAL_DECODERS.get(decode_fn)
    if decode_fn != "fake" and custom is None:
        codecs = available_codecs()
        raise RuntimeError(
            f"no decoder registered under {decode_fn!r}. Detected media "
            f"libraries: {codecs or 'none'}. Install PIL/ffmpeg and "
            f"register_real_decoder({decode_fn!r}, fn) with a batch decoder "
            f"(pandas batch of id/content/format/width/height/n_frames + "
            f"stride -> id/frame/width/height/pixels rows), or pass a "
            f"callable directly; decode_fn='fake' stays the oracle-matched "
            f"path.")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "frame", "width", "height", "pixels"]
        for pdf in batches:
            if custom is not None:
                yield custom(pdf, sample_every)
                continue
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            seeds = np.fromiter((_content_seed(c) for c in pdf["content"]),
                                dtype=np.int64, count=len(pdf))
            nf = pdf["n_frames"].to_numpy(np.int64)
            w = pdf["width"].to_numpy(np.int64)
            h = pdf["height"].to_numpy(np.int64)
            # expand rows -> one output row per sampled frame (vectorized)
            counts = (nf + sample_every - 1) // sample_every
            ri = np.repeat(np.arange(len(pdf)), counts)
            off = np.repeat(np.cumsum(counts) - counts, counts)
            fi = (np.arange(counts.sum()) - off) * sample_every
            out = pd.DataFrame({"id": pdf["id"].to_numpy(np.int64)[ri],
                                "frame": fi, "width": w[ri], "height": h[ri]})
            # pixel generation is uniform per (width, height) group
            px = np.empty(len(out), dtype=object)
            npx = w[ri] * h[ri]
            for n in np.unique(npx):
                m = np.nonzero(npx == n)[0]
                vals = _pixels(seeds[ri][m], fi[m], int(n)).tolist()
                for t, v in zip(m, vals):
                    px[t] = v
            out["pixels"] = list(px)
            yield out

    return df.mapInPandas(gen, schema=_DECODED_SCHEMA)


def resize_pixels(df: DataFrame, factor: int = 2) -> DataFrame:
    """average-pool downsample by ``factor`` (deterministic integer mean)."""
    f2 = factor * factor

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "frame", "width", "height", "pixels"]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            w = pdf["width"].to_numpy(np.int64)
            h = pdf["height"].to_numpy(np.int64)
            out = pd.DataFrame({"id": pdf["id"].to_numpy(np.int64),
                                "frame": pdf["frame"].to_numpy(np.int64),
                                "width": w // factor, "height": h // factor})
            pooled = np.empty(len(pdf), dtype=object)
            pxs = pdf["pixels"].to_numpy()
            for wh in np.unique(np.stack([w, h], axis=1), axis=0):
                m = np.nonzero((w == wh[0]) & (h == wh[1]))[0]
                wi, hi = int(wh[0]), int(wh[1])
                h2, w2 = hi // factor, wi // factor
                px = np.stack([np.asarray(pxs[t], dtype=np.int64)
                               for t in m]).reshape(-1, hi, wi)
                pl = ((px[:, :h2 * factor, :w2 * factor]
                       .reshape(-1, h2, factor, w2, factor)
                       .sum(axis=(2, 4)) // f2)
                      .reshape(-1, h2 * w2).tolist())
                for t, v in zip(m, pl):
                    pooled[t] = v
            out["pixels"] = list(pooled)
            yield out
    return df.mapInPandas(gen, schema=_DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """fixed-size per-frame features (exact integer-derived statistics).

    Double math is single-division / single-sqrt so the SQL replay
    (``multimodal_oracle_sql``) reproduces bit-identical values."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "frame", "mean_px", "std_px", "p_low", "p_high"]
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            px = np.stack([np.asarray(p, dtype=np.int64)
                           for p in pdf["pixels"]])
            n = float(px.shape[1])
            mean = px.sum(axis=1) / n
            var = (px * px).sum(axis=1) / n - mean * mean
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(np.int64),
                "frame": pdf["frame"].to_numpy(np.int64),
                "mean_px": mean,
                "std_px": np.sqrt(np.maximum(var, 0.0)),
                "p_low": (px < 64).sum(axis=1) / n,
                "p_high": (px >= 192).sum(axis=1) / n})
    return df.mapInPandas(gen, schema=_FEATURE_SCHEMA)


# --- exact SQL replay of the fake-codec pipeline ---------------------------

def _seed_sql(dialect: str, col: str = "text") -> str:
    """SQL twin of ``_content_seed`` (O(len) via the bound char array)."""
    def body(a: str) -> str:
        term = (f"CAST({dual.elem(dialect, a, 'k')} AS BIGINT) * "
                f"(((k * k) % 64) + 1)")
        arr = dual.transform(
            dialect, dual.sequence(dialect, "CAST(1 AS BIGINT)",
                                   f"CAST(length({col}) AS BIGINT)"),
            f"k -> ({term})")
        return dual.arr_sum_bigint(dialect, arr)
    bound = dual.bind_array(dialect, dual.ascii_array(dialect, col), body)
    return (f"(CASE WHEN length({col}) >= 1 THEN ({bound} % {_P31}) "
            f"ELSE CAST(0 AS BIGINT) END)")


def _px_sql(seed: str, frame: str, i_expr: str) -> str:
    """SQL twin of ``_pixels`` for one flattened pixel index."""
    s1 = (f"(({seed} + ({frame} + 1) * {_FMIX} + (({i_expr}) + 1) * "
          f"{_IMIX}) % {_P31})")
    s2 = f"(({s1} * {_MUL} + {_INC}) % {_P31})"
    s3 = f"(({s2} * {_MUL} + {_INC}) % {_P31})"
    return f"({s3} % 256)"


def multimodal_oracle_sql(dialect: str = DUCKDB, table: str = "documents",
                          text_col: str = "text", id_col: str = "doc_id",
                          n_frames: int = 4, sample_every: int = 2,
                          width: int = 16, height: int = 16,
                          factor: int = 2) -> str:
    """One SQL statement reproducing synthesize -> decode(fake) ->
    resize -> extract_features bit-exactly (fixed ``factor=2`` pooling)."""
    if factor != 2:
        raise ValueError("oracle supports factor=2 (the fixture shape)")
    frames = list(range(0, n_frames, sample_every))
    w2, h2 = width // factor, height // factor
    n2 = w2 * h2
    # pooled pixel j (0-based): source 2x2 block around (2r, 2c)
    r = f"CAST((j - (j % {w2})) / {w2} AS BIGINT)"
    c = f"(j % {w2})"
    quads = [f"CAST({_px_sql('seed', 'frame', f'(({r} * {factor} + {dr}) * {width} + ({c} * {factor} + {dc}))')} AS BIGINT)"
             for dr in range(factor) for dc in range(factor)]
    pooled = (f"CAST(FLOOR(CAST(({' + '.join(quads)}) AS DOUBLE) / "
              f"{dlit(factor * factor)}) AS BIGINT)")
    px_arr = dual.transform(
        dialect, dual.sequence(dialect, "CAST(0 AS BIGINT)",
                               f"CAST({n2 - 1} AS BIGINT)"),
        f"j -> {pooled}")
    frames_arr = dual.array_lit(dialect, [str(f) for f in frames])
    nd = dlit(float(n2))
    mean = f"(CAST(s AS DOUBLE) / {nd})"
    stages = [
        ("__mmseed",
         f"SELECT CAST({id_col} AS BIGINT) AS id, {_seed_sql(dialect, text_col)} AS seed "
         f"FROM {table}"),
        ("__mmframes",
         f"SELECT id, seed, {dual.explode(dialect, frames_arr, 'frame')} "
         f"FROM __mmseed"),
        ("__mmpool",
         f"SELECT id, frame, {px_arr} AS px FROM __mmframes"),
        ("__mmagg",
         "SELECT id, frame, "
         f"{dual.arr_sum_bigint(dialect, 'px')} AS s, "
         f"{dual.arr_sum_bigint(dialect, dual.transform(dialect, 'px', 'p -> p * p'))} AS sq, "
         f"{dual.arr_sum_bigint(dialect, dual.transform(dialect, 'px', 'p -> (CASE WHEN p < 64 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)'))} AS nlo, "
         f"{dual.arr_sum_bigint(dialect, dual.transform(dialect, 'px', 'p -> (CASE WHEN p >= 192 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)'))} AS nhi "
         "FROM __mmpool"),
    ]
    final = (f"SELECT id, CAST(frame AS INT) AS frame, {mean} AS mean_px, "
             f"sqrt(greatest(CAST(sq AS DOUBLE) / {nd} - {mean} * {mean}, "
             f"{dlit(0.0)})) AS std_px, "
             f"CAST(nlo AS DOUBLE) / {nd} AS p_low, "
             f"CAST(nhi AS DOUBLE) / {nd} AS p_high "
             f"FROM __mmagg ORDER BY id, frame")
    return dual.stages_sql(stages, final)


def multimodal_ppm_oracle_sql(dialect: str = DUCKDB,
                              table: str = "documents",
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              width: int = 8, height: int = 8,
                              n_frames: int = 1,
                              sample_every: int = 1) -> str:
    """SQL replay of encode_ppm_media -> decode_media("ppm") ->
    extract_features: the encoder writes channels (r, (r+85)%256,
    (r+170)%256) from the per-frame LCG pixel stream and the REAL
    decoder's luma is (r+g+b)//3 exactly, so the whole real-codec round
    trip — including the multi-frame container's ``sample_every``
    frame-stride branch — is integer SQL."""
    frames = list(range(0, n_frames, max(1, sample_every)))
    n = width * height
    px = f"CAST({_px_sql('seed', 'frame', 'j')} AS BIGINT)"
    luma = (f"CAST(FLOOR(CAST(({px} + ({px} + 85) % 256 + "
            f"({px} + 170) % 256) AS DOUBLE) / {dlit(3.0)}) AS BIGINT)")
    lum_arr = dual.transform(
        dialect, dual.sequence(dialect, "CAST(0 AS BIGINT)",
                               f"CAST({n - 1} AS BIGINT)"),
        f"j -> {luma}")
    frames_arr = dual.array_lit(dialect, [str(f) for f in frames])
    nd = dlit(float(n))
    mean = f"(CAST(s AS DOUBLE) / {nd})"
    stages = [
        ("__mpseed",
         f"SELECT CAST({id_col} AS BIGINT) AS id, "
         f"{_seed_sql(dialect, text_col)} AS seed FROM {table}"),
        ("__mpframes",
         f"SELECT id, seed, {dual.explode(dialect, frames_arr, 'frame')} "
         f"FROM __mpseed"),
        ("__mppix", f"SELECT id, frame, {lum_arr} AS px FROM __mpframes"),
        ("__mpagg",
         "SELECT id, frame, "
         f"{dual.arr_sum_bigint(dialect, 'px')} AS s, "
         f"{dual.arr_sum_bigint(dialect, dual.transform(dialect, 'px', 'p -> p * p'))} AS sq, "
         f"{dual.arr_sum_bigint(dialect, dual.transform(dialect, 'px', 'p -> (CASE WHEN p < 64 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)'))} AS nlo, "
         f"{dual.arr_sum_bigint(dialect, dual.transform(dialect, 'px', 'p -> (CASE WHEN p >= 192 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)'))} AS nhi "
         "FROM __mppix"),
    ]
    final = (f"SELECT id, CAST(frame AS INT) AS frame, {mean} AS mean_px, "
             f"sqrt(greatest(CAST(sq AS DOUBLE) / {nd} - {mean} * {mean}, "
             f"{dlit(0.0)})) AS std_px, "
             f"CAST(nlo AS DOUBLE) / {nd} AS p_low, "
             f"CAST(nhi AS DOUBLE) / {nd} AS p_high "
             f"FROM __mpagg ORDER BY id, frame")
    return dual.stages_sql(stages, final)


# the PPM codec is stdlib-only: install it unconditionally so
# decode_media(decode_fn="ppm") works in every environment
register_real_decoder("ppm", ppm_image_decoder)
