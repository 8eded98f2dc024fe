"""Multimodal columns: image / audio / video as opaque binary
payloads with typed metadata, plus decode / feature-extract / resize /
frame-sample operators (north-star training-data pipeline surface).

Layout principles (the part that matters at 100 TB):

- media rows carry ``payload: binary`` next to typed metadata columns;
  metadata-only queries never touch the payload bytes (Parquet column
  pruning — check ReadSchema in .explain);
- every decode-shaped operator is an Arrow-batched ``mapInPandas``
  over payload bytes, numpy-vectorized inside the batch — the exact
  plumbing a real PIL/ffmpeg/librosa decoder plugs into;
- the *container* is deterministic: payload bytes are
  ``unhex(repeat(md5(text), k))`` sliced to the declared media
  geometry. Real codecs are not installed here, so the "decode" is
  byte-identity onto a pixel/sample grid — but because the bytes are
  recomputable with pure string math on the md5 hex digest, the
  DuckDB oracle verifies the UDF OUTPUTS by value, not just row
  counts. The swap-in point for real decoders is ``_decode_real``.

Reference analog: the binary document payloads + per-type dispatch of
ingestion (ref: ingestion_service.py:108-155 magic-byte sniffing,
:241 raw bytes), generalized from {pdf,docx,eml} to {image,audio,
video}.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load, spread

# Deterministic media geometry per doc (all derivable from doc_id in
# both engines).
_REPEAT = 27  # md5 hex reps — enough bytes for the largest payload


def _width() -> Column:
    return (F.lit(8) + F.col("doc_id") % 8).cast("int")


def _height() -> Column:
    return (F.lit(4) + F.col("doc_id") % 4).cast("int")


def _n_frames() -> Column:
    return (F.lit(2) + F.col("doc_id") % 3).cast("int")


_W_SQL = "CAST(8 + doc_id % 8 AS INT)"
_H_SQL = "CAST(4 + doc_id % 4 AS INT)"
_NF_SQL = "CAST(2 + doc_id % 3 AS INT)"


def media_table(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    """documents → media rows: (media_id, kind, width, height,
    n_frames, payload binary). Image payload = w·h bytes; video =
    w·h·n_frames bytes (n_frames stacked grayscale frames); audio =
    w·h samples of 8-bit PCM (same byte budget, 1 "frame")."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    w, h = _width(), _height()
    nf = _n_frames() if kind == "video" else F.lit(1).cast("int")
    n_bytes = (w * h * nf).cast("int")
    hexstr = F.repeat(F.md5("text"), _REPEAT)
    payload = F.unhex(F.substring(hexstr, F.lit(1), n_bytes * 2))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        w.alias("width"),
        h.alias("height"),
        nf.alias("n_frames"),
        payload.alias("payload"),
    )


# SQL fragment: value of payload byte i (1-based) as an integer, from
# the md5 hex string — 16·hexval(c₂ᵢ₋₁) + hexval(c₂ᵢ). Pure string
# math, so DuckDB never needs to parse a BLOB.
def _byte_sql(i_expr: str) -> str:
    hx = f"repeat(md5(text), {_REPEAT})"
    digit = "strpos('0123456789abcdef', {c}) - 1"
    c_hi = f"substr({hx}, 2*({i_expr}) - 1, 1)"
    c_lo = f"substr({hx}, 2*({i_expr}), 1)"
    return f"(16 * ({digit.format(c=c_hi)}) + ({digit.format(c=c_lo)}))"


@register(
    "q_media_metadata",
    oracle=f"""
SELECT doc_id AS media_id,
       'image' AS kind,
       {_W_SQL} AS width,
       {_H_SQL} AS height,
       CAST({_W_SQL} * {_H_SQL} AS BIGINT) AS payload_bytes
FROM documents
""",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection over the media table — never reads
    payload bytes (column pruning; at scale this is the difference
    between scanning kilobytes and scanning the whole object store)."""
    m = media_table(spark, sf_dir, "image")
    return m.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.length("payload").alias("payload_bytes"),
    )


def _decode_real(payload: bytes, fmt: str):  # pragma: no cover - stub
    """Swap-in point for real codecs (PIL / ffmpeg / librosa). Those
    libraries are not installed in this environment; the engine's
    deterministic container above stands in for them in tests."""
    raise NotImplementedError(
        f"real {fmt} decoding requires an image/audio codec library; "
        "install one and route it here"
    )


@register(
    "q_image_decode_stats",
    oracle=f"""
WITH px AS (
  SELECT doc_id AS media_id,
         list_transform(generate_series(1, {_W_SQL} * {_H_SQL}),
                        i -> {_byte_sql('i')}) AS pixels
  FROM documents
)
SELECT media_id,
       CAST(len(pixels) AS BIGINT) AS n_pixels,
       round(list_sum(pixels) / CAST(len(pixels) AS DOUBLE), 6) AS mean_pixel,
       CAST(list_max(pixels) AS BIGINT) AS max_pixel
FROM px
""",
)
def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + global feature extraction: Arrow-batched
    mapInPandas, numpy over the raw bytes — the plumbing (schema,
    batch shape, binary round-trip) a real decoder inherits. The
    oracle recomputes every pixel from the hex digest, so this UDF is
    verified by value."""
    import numpy as np
    import pandas as pd

    m = media_table(spark, sf_dir, "image").select("media_id", "payload")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            px = [np.frombuffer(b, dtype=np.uint8) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_pixels": [int(a.size) for a in px],
                    "mean_pixel": [round(float(a.mean()), 6) for a in px],
                    "max_pixel": [int(a.max()) for a in px],
                }
            )

    return m.mapInPandas(
        gen, "media_id long, n_pixels long, mean_pixel double, max_pixel long"
    )


@register(
    "q_image_resize",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS media_id, {_W_SQL} AS w, {_H_SQL} AS h FROM documents
),
rs AS (
  SELECT media_id, w, h, w // 2 AS new_w, h // 2 AS new_h,
         -- nearest-neighbor stride-2: kept pixel (r, c) of the
         -- original row-major grid, 0-based, byte index = r*w + c + 1
         list_transform(
           flatten(list_transform(generate_series(0, h // 2 - 1), r ->
             list_transform(generate_series(0, w // 2 - 1), c ->
               (2 * r) * w + (2 * c) + 1))),
           i -> {_byte_sql('i')}) AS kept
  FROM g JOIN documents ON documents.doc_id = g.media_id
)
SELECT media_id, CAST(new_w AS INT) AS new_width, CAST(new_h AS INT) AS new_height,
       CAST(list_sum(kept) % 9973 AS BIGINT) AS pixel_checksum
FROM rs
""",
)
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 2× downsample inside mapInPandas (numpy strided
    slicing on the decoded grid) — the resize slot of the media
    pipeline; checksum of kept pixels is value-checked against the
    oracle's index arithmetic."""
    import numpy as np
    import pandas as pd

    m = media_table(spark, sf_dir, "image").select(
        "media_id", "width", "height", "payload"
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "new_width": [], "new_height": [],
                   "pixel_checksum": []}
            for mid, w, h, b in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                img = np.frombuffer(b, dtype=np.uint8).reshape(h, w)
                small = img[::2, ::2][: h // 2, : w // 2]
                out["media_id"].append(mid)
                out["new_width"].append(w // 2)
                out["new_height"].append(h // 2)
                out["pixel_checksum"].append(int(small.sum()) % 9973)
            yield pd.DataFrame(out)

    return m.mapInPandas(
        gen, "media_id long, new_width int, new_height int, pixel_checksum long"
    )


@register(
    "q_frame_sample",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS media_id, {_W_SQL} AS w, {_H_SQL} AS h, {_NF_SQL} AS nf
  FROM documents
),
fr AS (
  SELECT media_id, w, h, unnest(generate_series(0, nf - 1, 2)) AS frame_idx
  FROM g
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       round(list_sum(list_transform(generate_series(frame_idx * w * h + 1,
                                                     (frame_idx + 1) * w * h),
                                     i -> {_byte_sql('i')}))
             / CAST(w * h AS DOUBLE), 6) AS frame_mean
FROM fr JOIN documents ON doc_id = media_id
""",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling as a UDTF-shaped mapInPandas: one input
    video row → one output row per sampled frame (every 2nd frame),
    with a per-frame decoded feature. Fan-out lives inside the UDF —
    the Spark-side contract is just the output schema."""
    import numpy as np
    import pandas as pd

    m = media_table(spark, sf_dir, "video").select(
        "media_id", "width", "height", "n_frames", "payload"
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_mean": []}
            for mid, w, h, nf, b in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["n_frames"], pdf["payload"],
            ):
                vid = np.frombuffer(b, dtype=np.uint8).reshape(nf, h * w)
                for fi in range(0, nf, 2):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_mean"].append(round(float(vid[fi].mean()), 6))
            yield pd.DataFrame(out)

    return m.mapInPandas(gen, "media_id long, frame_idx int, frame_mean double")


_AUDIO_WIN = 16


@register(
    "q_audio_rms",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS media_id, {_W_SQL} * {_H_SQL} AS n_samples FROM documents
),
w AS (
  SELECT media_id, n_samples,
         unnest(generate_series(0, n_samples // {_AUDIO_WIN} - 1)) AS win_idx
  FROM g
)
SELECT media_id, CAST(win_idx AS INT) AS win_idx,
       round(sqrt(list_sum(list_transform(
                generate_series(win_idx * {_AUDIO_WIN} + 1,
                                (win_idx + 1) * {_AUDIO_WIN}),
                i -> CAST({_byte_sql('i')} AS DOUBLE) ** 2))
             / {_AUDIO_WIN}), 6) AS rms
FROM w JOIN documents ON doc_id = media_id
""",
)
def q_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: 8-bit PCM payload → windowed RMS
    (fixed-width windows, no overlap), numpy-vectorized per Arrow
    batch; complete windows only. The librosa-style mel/spectrogram
    step would replace the RMS line inside the same UDF."""
    import numpy as np
    import pandas as pd

    m = media_table(spark, sf_dir, "audio").select("media_id", "payload")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "win_idx": [], "rms": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                a = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                n_win = a.size // _AUDIO_WIN
                w = a[: n_win * _AUDIO_WIN].reshape(n_win, _AUDIO_WIN)
                rms = np.sqrt((w * w).mean(axis=1))
                out["media_id"].extend([mid] * n_win)
                out["win_idx"].extend(range(n_win))
                out["rms"].extend(round(float(x), 6) for x in rms)
            yield pd.DataFrame(out)

    return m.mapInPandas(gen, "media_id long, win_idx int, rms double")


_SCENE_TAU = 4.0  # mean-luminance jump that counts as a cut (~p90
# of consecutive-frame jumps on the synthetic payloads — the repeated
# 16-byte md5 cycle makes frames near-identical, so jumps are small)


@register(
    "q_scene_changes",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS media_id, {_W_SQL} AS w, {_H_SQL} AS h, {_NF_SQL} AS nf
  FROM documents
),
fr AS (
  SELECT media_id, w, h, unnest(generate_series(0, nf - 1)) AS frame_idx
  FROM g
),
fm AS (
  SELECT media_id, frame_idx,
         round(list_sum(list_transform(generate_series(frame_idx * w * h + 1,
                                                       (frame_idx + 1) * w * h),
                                       i -> {{BYTE}}))
               / CAST(w * h AS DOUBLE), 6) AS m
  FROM fr JOIN documents ON doc_id = media_id
),
j AS (
  SELECT media_id,
         round(abs(m - lag(m) OVER (PARTITION BY media_id ORDER BY frame_idx)), 6)
           AS jump
  FROM fm
)
SELECT media_id,
       count(CASE WHEN jump > {_SCENE_TAU} THEN 1 END) AS n_cuts,
       max(jump) AS max_jump
FROM j WHERE jump IS NOT NULL
GROUP BY media_id
""".replace("{BYTE}", _byte_sql("i")),
)
def q_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-change detection: per-frame mean luminance from
    the decode UDF, consecutive-frame jumps via a lag window, cuts
    where the jump exceeds a threshold — the shot-segmentation pass
    video training pipelines run before frame dedup/captioning. A
    real decoder swaps in at _decode_real without touching the
    window/aggregate half.

    Shape: the UDF emits |frames| small rows (never the payload);
    the lag window and the per-media rollup both partition on
    media_id, so everything after decode moves one exchange of
    frame-feature rows. Jumps are computed from round-6 frame means
    and re-rounded, so the cut decision at the threshold is
    identical across engines."""
    import numpy as np
    import pandas as pd

    m = media_table(spark, sf_dir, "video").select(
        "media_id", "width", "height", "n_frames", "payload"
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "m": []}
            for mid, w, h, nf, b in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["n_frames"], pdf["payload"],
            ):
                vid = np.frombuffer(b, dtype=np.uint8).reshape(nf, h * w)
                for fi in range(nf):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["m"].append(round(float(vid[fi].mean()), 6))
            yield pd.DataFrame(out)

    fm = m.mapInPandas(gen, "media_id long, frame_idx int, m double")
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    j = fm.select(
        "media_id",
        F.round(F.abs(F.col("m") - F.lag("m").over(w)), 6).alias("jump"),
    ).filter(F.col("jump").isNotNull())
    return j.groupBy("media_id").agg(
        F.count(F.when(F.col("jump") > _SCENE_TAU, 1)).alias("n_cuts"),
        F.max("jump").alias("max_jump"),
    )


@register(
    "q_media_hist_arrow",
    oracle=f"""
WITH g AS (
  SELECT doc_id AS media_id, {_W_SQL} * {_H_SQL} AS n FROM documents
),
px AS (
  SELECT media_id, {{BYTE}} // 64 AS bin
  FROM g JOIN documents ON doc_id = media_id,
       LATERAL (SELECT unnest(generate_series(1, g.n)) AS i) d
)
SELECT media_id, CAST(bin AS INT) AS bin, count(*) AS n_pixels
FROM px GROUP BY media_id, bin
""".replace("{BYTE}", _byte_sql("d.i")),
)
def q_media_hist_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 4-bin luminance histogram via ``mapInArrow`` — the
    Spark-4 Arrow-native UDF path (RecordBatch in, RecordBatch out,
    zero pandas materialization), demonstrated next to the
    mapInPandas decoders above: same decode semantics, one less
    conversion layer, the right shape when the per-row payload is
    binary and the output is columnar. Histogram counts are exact
    integers, value-checked against the oracle's hex-digit pixel
    recomputation like every other decode op here.

    Shape: the UDF emits ≤4 rows per image (never the payload); the
    rollup is a (media, bin) partial aggregate."""
    import pyarrow as pa
    import numpy as np

    m = media_table(spark, sf_dir, "image").select("media_id", "payload")

    def gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            ids = rb.column(0).to_pylist()
            payloads = rb.column(1).to_pylist()
            out_id, out_bin, out_n = [], [], []
            for mid, b in zip(ids, payloads):
                px = np.frombuffer(b, dtype=np.uint8)
                counts = np.bincount(px // 64, minlength=4)
                for bin_i in range(4):
                    if counts[bin_i]:
                        out_id.append(mid)
                        out_bin.append(bin_i)
                        out_n.append(int(counts[bin_i]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_bin, pa.int32()),
                    pa.array(out_n, pa.int64()),
                ],
                names=["media_id", "bin", "n_pixels"],
            )

    return m.mapInArrow(gen, "media_id long, bin int, n_pixels long")
