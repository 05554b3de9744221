"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata.

The container has no image/audio decode libraries, so the decode kernel
is stubbed (deterministic fake keyed off the payload bytes, or
NotImplementedError for the real path) — but the Spark-side plumbing is
real and tested: schemas, Arrow batch shape, mapInPandas signature,
partition sizing. Swapping in PIL/torchaudio later touches ONLY
``_decode_payload``.

Design for 100 TB of media:
- payloads live in their own column so Parquet column pruning skips them
  unless the query touches bytes;
- metadata extraction is a per-row expression pass (sha, length, magic
  sniffing) — no Python;
- the decode path is ``mapInPandas`` (Arrow batches, one Python worker
  per partition), with ``spark.sql.files.maxPartitionBytes`` controlling
  batch memory; never a row-at-a-time UDF.
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
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

REAL_DECODERS_AVAILABLE = False  # no PIL/cv2/torchaudio in this container


def payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Expression-only metadata: byte length, sha256, magic-byte format
    sniff. Runs without touching Python."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    fmt = (
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("52494646"), "riff-wav")
        .when(magic.startswith("00000018") | magic.startswith("00000020"), "mp4")
        .otherwise("unknown")
    )
    return df.withColumns(
        {
            "byte_len": F.octet_length(p).cast("long"),
            "sha256": F.sha2(p, 256),
            "sniffed_format": fmt,
        }
    )


def _decode_payload(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decode kernel. Real implementation requires an image/audio
    library not present in this container; the fake is deterministic in
    the payload bytes so tests are stable.

    Returns (width, height, n_frames, feature[8]).
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL/cv2/torchaudio decode here")
    n = len(payload)
    head = payload[:8].ljust(8, b"\0")
    width = 1 + head[0] % 64
    height = 1 + head[1] % 64
    n_frames = 1 + n % 16
    feature = [float((head[i] + n) % 256) / 256.0 for i in range(8)]
    return width, height, n_frames, feature


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode pass: MEDIA_SCHEMA rows → DECODED_SCHEMA rows.

    Arrow-batched; each batch is decoded columnarly in one Python call.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "feature": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def _resize_payload(payload: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize kernel (real path: PIL `Image.resize` /
    `cv2.resize`). The fake emits a deterministic target_w×target_h-byte
    'thumbnail' sampled from the payload so size contracts and
    determinism are testable."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL/cv2 resize here")
    n = max(len(payload), 1)
    return bytes(payload[(i * n) // (target_w * target_h)] for i in range(target_w * target_h))


def resize_media(df: DataFrame, target_w: int = 8, target_h: int = 8) -> DataFrame:
    """mapInPandas resize pass: MEDIA_SCHEMA rows → fixed-size thumbnails
    (media_id, width, height, thumb BINARY). Arrow-batched like
    decode_media; at 100 TB the batch memory bound is
    maxPartitionBytes + (rows_per_batch × target_w × target_h)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "thumb": [_resize_payload(bytes(p), target_w, target_h) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing on decoded media: one output row per kept
    frame index — pure explode arithmetic, no decode."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1)
    kept = F.filter(idx, lambda i: i % every_n == 0)
    return df.select("media_id", F.explode(kept).alias("frame_idx"))
