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


# ---------------------------------------------------------------------------
# Real image bytes: stdlib-only PNG synthesis + header decode
# ---------------------------------------------------------------------------
# The container has no image libraries, but "real decode" does not need one
# for container metadata: PNG/BMP/GIF/JPEG dimensions live in fixed header
# fields, and a PNG can be WRITTEN with nothing but struct+zlib (the IDAT
# payload is zlib-compressed filtered scanlines; CRCs are zlib.crc32). So the
# real path synthesizes genuine PNG files deterministically from doc_id and
# decodes them back by parsing the actual bytes — a true encode/decode round
# trip, stdlib end-to-end. Full pixel rasterization (beyond dimensions) is
# the only part still gated on PIL (decode_image_real).


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """A genuine, spec-valid grayscale PNG (8-bit, non-interlaced) built
    with struct+zlib only. Pixel (x, y) = (x + y + seed) % 256."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x + y + seed) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A genuine BITMAPINFOHEADER 8-bit grayscale BMP via struct only."""
    import struct

    row = (width + 3) & ~3  # rows pad to 4 bytes
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    pixels = b"".join(
        bytes((x + y + seed) % 256 for x in range(width)) + b"\x00" * (row - width)
        for y in range(height)
    )
    offset = 14 + 40 + len(palette)
    return (
        struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(pixels), 2835, 2835, 256, 0)
        + palette
        + pixels
    )


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """Decode (width, height, format) from real image bytes — stdlib byte
    parsing of the actual container headers (PNG IHDR, BMP info header,
    GIF logical screen, JPEG SOF scan). None for unrecognized payloads."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h), "png"
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h)), "bmp"
    if payload[:4] in (b"GIF8",) and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), "gif"
    if payload[:2] == b"\xff\xd8":  # JPEG: scan for a SOF marker
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h), "jpeg"
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def synthesize_png_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched producer of REAL image payloads: one genuine PNG per
    doc, dimensions a pure function of the id (width = 1 + id % 16,
    height = 1 + (id // 16) % 16) so downstream decode is value-checkable
    without shipping binary fixtures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = [
                make_png(int(1 + i % 16), int(1 + (i // 16) % 16), seed=int(i))
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": "image/png",
                }
            )

    return docs.select(F.col(id_col)).mapInPandas(
        batches, schema="doc_id long, payload binary, media_type string"
    )


def decode_media_real(media: DataFrame) -> DataFrame:
    """REAL decode via mapInPandas: parses the actual container bytes
    (parse_image_header) — same plan shape, schema, and batching as
    decode_media_stub, but the values come from the payload's real header
    fields. Unrecognized payloads decode to nulls rather than failing the
    batch (corpus hygiene: a 100 TB media crawl always contains junk)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "format": [p[2] if p else None for p in parsed],
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)
