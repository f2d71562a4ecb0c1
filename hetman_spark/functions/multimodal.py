"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, batch shapes, partition hygiene,
mapInPandas signatures) is real and tested; the codec work itself is
STUBBED behind _decode_image/_decode_audio with deterministic fakes —
the container has no image/audio libraries (Pillow, ffmpeg, librosa).
Swap the stub bodies for real decoders on a cluster that has them;
nothing else changes.

Design rules for binary-heavy tables at scale:
- keep Arrow batches small (session sets maxRecordsPerBatch=2048;
  drop further for multi-MB blobs);
- never collect_list/groupBy over the blob column;
- carry blob metadata (size, format, checksum) as columns so
  filters prune before any decode runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | jpeg | wav | mp4 ...
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach size + checksum columns so downstream filters prune
    without touching payload bytes again."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "checksum", F.md5(F.col(payload_col))
    )


def _decode_image(payload: bytes, fmt: str) -> tuple[int, int, int]:
    """STUB: real implementation returns (width, height, channels) via
    Pillow/opencv.  Deterministic fake derives plausible dims from the
    payload hash so the plumbing is testable end-to-end."""
    if payload is None:
        raise NotImplementedError("image decode requires Pillow (not in this container)")
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return (64 + h % 1024, 64 + (h >> 10) % 1024, 3)


def _decode_audio(payload: bytes, fmt: str) -> tuple[int, float]:
    """STUB: real implementation returns (sample_rate, duration_sec)
    via soundfile/librosa.  Deterministic fake."""
    if payload is None:
        raise NotImplementedError("audio decode requires soundfile (not in this container)")
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return (16000, round(0.5 + (h % 600) / 10.0, 1))


_IMAGE_FEATURES_SCHEMA = (
    "media_id long, format string, width int, height int, channels int, "
    "n_bytes long, checksum string"
)


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas over image rows -> typed feature rows.

    n_bytes/checksum are computed JVM-side (with_media_metadata: length
    + md5 in codegen) BEFORE the UDF and passed through the Arrow batch
    untouched — the ONLY per-row Python left is the codec call itself,
    which a real decoder (Pillow/opencv) is inherently.  Batch shape:
    one pandas frame per Arrow batch; blobs never cross per-row into
    the JVM.
    """
    imgs = df.filter(F.col("kind") == "image")
    if "n_bytes" not in imgs.columns or "checksum" not in imgs.columns:
        imgs = with_media_metadata(imgs)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the codec call — the one irreducibly per-row step
            dims = [
                _decode_image(p, f)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "width": pd.array([d[0] for d in dims], dtype="int32"),
                    "height": pd.array([d[1] for d in dims], dtype="int32"),
                    "channels": pd.array([d[2] for d in dims], dtype="int32"),
                    "n_bytes": pdf["n_bytes"],
                    "checksum": pdf["checksum"],
                }
            )

    cols = ["media_id", "kind", "format", "payload", "n_bytes", "checksum"]
    return imgs.select(*cols).mapInPandas(op, _IMAGE_FEATURES_SCHEMA)


_FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: mapInPandas yielding
    multiple rows per input row (1 -> N explode inside the Arrow
    batch).  The decode is stubbed: fake frames are deterministic
    byte slices; a real build swaps in pyav/ffmpeg."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"media_id": pd.array([], dtype="int64"),
                     "frame_idx": pd.array([], dtype="int32"),
                     "frame_payload": []}
                )
                continue
            payloads_in = [b or b"" for b in pdf["payload"]]
            # vectorized fan-out arithmetic: frames per row, then a
            # flat explode index — no iterrows, no per-row append loop
            lens = np.fromiter((len(b) for b in payloads_in), dtype=np.int64, count=len(pdf))
            n = np.clip(lens // max(every_n, 1), 1, max_frames)
            row_of = np.repeat(np.arange(len(pdf)), n)
            ends = np.cumsum(n)
            within = np.arange(int(ends[-1])) - np.repeat(ends - n, n)
            frame_idx = (within * every_n).astype(np.int32)
            starts = frame_idx % np.maximum(lens[row_of], 1)
            # the (stubbed) frame decode — the one per-frame step a
            # real pyav/ffmpeg build also pays
            frames = [
                bytes(payloads_in[r][s : s + 16])
                for r, s in zip(row_of, starts)
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy()[row_of],
                 "frame_idx": frame_idx,
                 "frame_payload": frames}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(op, _FRAME_SAMPLE_SCHEMA)


def synth_media(spark, n_rows: int = 100) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the row id (md5 chain), kinds round-robin."""
    df = spark.range(n_rows)
    payload = F.concat(
        *[
            F.encode(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{i}"))), "utf-8")
            for i in range(4)
        ]
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")
    )
    fmt = F.when(kind == "image", F.lit("png")).when(kind == "audio", F.lit("wav")).otherwise(F.lit("mp4"))
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        fmt.alias("format"),
        payload.alias("payload"),
    )
