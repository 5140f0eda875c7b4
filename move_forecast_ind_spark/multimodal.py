"""Multimodal column handling (north star, BASELINE.json).

Pattern: media (image/audio/video) live as opaque ``binary`` columns with a
typed metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the bytes never
round-trip through Python row-at-a-time.

The container has no image/audio libraries, so the actual decoder is STUBBED
(``decode_image_real`` raises NotImplementedError); ``decode_image_stub`` is
a clearly-marked deterministic fake that exercises the real Spark plumbing —
schema, batching, partitioning — end-to-end. Swapping in PIL/ffmpeg later
changes only the per-batch function body.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` governs batch memory; metadata-only
queries must select around the binary column (parquet column pruning skips
the bytes entirely — see tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, n_bytes long, digest string"
)
DECODED_SCHEMA = "doc_id long, n_bytes long, width int, height int, format string"


def to_media_table(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pack a source column into the opaque-binary + metadata layout (for
    the fixture corpus the 'media' payload is the utf-8 text bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int, str]:
    """Real decoder — requires an image library not present in this
    container. The Spark-side plumbing is identical to the stub's."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips; not available in this environment"
    )


def decode_media_stub(media: DataFrame) -> DataFrame:
    """Deterministic FAKE decode (clearly marked): derives pseudo
    width/height/format from payload length alone. Exercises the real
    mapInPandas path: Arrow batches in, trimmed columns out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640 + 16).astype("int32"),
                    "height": (n % 480 + 16).astype("int32"),
                    "format": n.map(lambda b: "png" if b % 2 == 0 else "jpeg"),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape: explode each payload into per-'frame' offsets
    (stub: fixed stride over the byte stream) — the operator layout a video
    pipeline uses, minus the codec."""
    n_frames = F.greatest(
        (F.col("n_bytes") / F.lit(every_n_bytes)).cast("int"), F.lit(1)
    )
    return media.select(
        "doc_id",
        "n_bytes",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
