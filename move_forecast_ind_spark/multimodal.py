"""Multimodal column handling (north star, BASELINE.json).

Pattern: media (image/audio/video) live as opaque ``binary`` columns with a
typed metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the bytes never
round-trip through Python row-at-a-time.

The container has no image/audio libraries, but the formats whose coding is
stdlib-expressible are decoded for REAL: PNG is synthesized AND fully
rasterized with struct+zlib (all five scanline filters), BMP with struct
alone, WAV (PCM16) likewise — see the sections below. Only codec-bound
entropy coding (JPEG huffman/DCT, GIF LZW) stays gated behind a clearly
marked NotImplementedError; ``decode_media_stub`` remains as the
deterministic fake used by plumbing-only tests. Swapping in PIL/ffmpeg
later changes only the per-batch function body.

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
    """Full-raster decoder dispatch. PNG (8-bit grayscale profile) and
    8-bit BMP are rasterized entirely with the stdlib (decode_png_pixels /
    decode_bmp_pixels — zlib inflate + PNG unfiltering, palette + padded
    rows); formats whose entropy coding needs a codec library (JPEG
    huffman/DCT, GIF LZW beyond the header) remain honestly gated."""
    px = decode_png_pixels(payload)
    if px is not None:
        return px.shape[1], px.shape[0], "png"
    px = decode_bmp_pixels(payload)
    if px is not None:
        return px.shape[1], px.shape[0], "bmp"
    raise NotImplementedError(
        "full rasterization of JPEG/GIF needs a codec library (PIL/libvips); "
        "not available in this environment — header metadata still decodes "
        "via parse_image_header"
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
# The container has no image libraries, but "real decode" does not need one:
# PNG/BMP/GIF/JPEG dimensions live in fixed header fields, a PNG can be
# WRITTEN with nothing but struct+zlib (the IDAT payload is zlib-compressed
# filtered scanlines; CRCs are zlib.crc32), and — because PNG's only
# compression method IS zlib plus five byte-arithmetic scanline filters —
# it can be fully RASTERIZED with the stdlib too (decode_png_pixels; all
# five filter types implemented per the PNG spec). The real path
# synthesizes genuine PNG files deterministically from doc_id and decodes
# them back from the actual bytes — a true encode/decode round trip,
# stdlib end-to-end, down to the pixels. Only formats whose entropy coding
# needs a codec library (JPEG huffman/DCT) stay gated.


def _paeth(left: int, up: int, upleft: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of the three neighbors."""
    p = left + up - upleft
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else upleft


def _png_filter_row(ftype: int, raw: bytes, prior: bytes) -> bytes:
    """Apply PNG filter ``ftype`` to one 8-bit grayscale scanline (bpp=1)."""
    if ftype == 0:
        return raw
    out = bytearray(len(raw))
    for x in range(len(raw)):
        left = raw[x - 1] if x else 0
        up = prior[x]
        upleft = prior[x - 1] if x else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[x] = (raw[x] - pred) & 0xFF
    return bytes(out)


def _png_unfilter_row(ftype: int, filt: bytes, prior: bytes) -> bytes:
    """Invert PNG filter ``ftype`` for one 8-bit grayscale scanline."""
    if ftype == 0:
        return filt
    out = bytearray(len(filt))
    for x in range(len(filt)):
        left = out[x - 1] if x else 0
        up = prior[x]
        upleft = prior[x - 1] if x else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[x] = (filt[x] + pred) & 0xFF
    return bytes(out)


def make_png(
    width: int, height: int, seed: int = 0, filter_mode: str = "none"
) -> bytes:
    """A genuine, spec-valid grayscale PNG (8-bit, non-interlaced) built
    with struct+zlib only. Pixel (x, y) = (x + y + seed) % 256.

    ``filter_mode``: ``"none"`` emits every scanline with filter type 0
    (byte-stable with earlier fixture generations); ``"cycle"`` filters
    row y with type y % 5, exercising ALL five PNG filters — the decoder
    must implement Sub/Up/Average/Paeth correctly to reproduce the pixels.
    """
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
    parts = []
    prior = bytes(width)
    for y in range(height):
        raw = bytes((x + y + seed) % 256 for x in range(width))
        ftype = (y % 5) if filter_mode == "cycle" else 0
        parts.append(bytes((ftype,)) + _png_filter_row(ftype, raw, prior))
        prior = raw
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes):
    """FULL PNG rasterization with the stdlib: walk the real chunk stream,
    inflate the concatenated IDATs with zlib, and invert the per-scanline
    filters (all five types, PNG spec §9) to recover the pixel array.
    Supports what the spec makes zlib-decodable without a codec library:
    8-bit grayscale (color type 0), non-interlaced — exactly the profile
    ``make_png`` writes. Returns ``np.ndarray[uint8]`` of shape (h, w), or
    None for non-PNG / unsupported-profile / corrupt payloads."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, width = 8, None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + size]
            if tag == b"IHDR":
                width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                    ">IIBBBBB", body
                )
                if (depth, ctype, comp, filt, ilace) != (8, 0, 0, 0, 0):
                    return None
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + size  # len + tag + body + crc
        if width is None:
            return None
        raw = zlib.decompress(bytes(idat))
    except Exception:
        return None
    if len(raw) != height * (width + 1):
        return None
    rows, prior = [], bytes(width)
    for y in range(height):
        line = raw[y * (width + 1) : (y + 1) * (width + 1)]
        try:
            cur = _png_unfilter_row(line[0], line[1:], prior)
        except ValueError:
            return None
        rows.append(np.frombuffer(cur, dtype=np.uint8))
        prior = cur
    return np.stack(rows) if rows else np.zeros((0, width), dtype=np.uint8)


def decode_bmp_pixels(payload: bytes):
    """Full 8-bit-palette BMP rasterization (the profile ``make_bmp``
    writes): reads the palette and the bottom-up, 4-byte-padded pixel
    rows, returning the grayscale values ``np.ndarray[uint8]`` (h, w), or
    None for non-BMP / unsupported-profile payloads."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    try:
        (offset,) = struct.unpack("<I", payload[10:14])
        hsize, width, height, _planes, bits = struct.unpack("<IiiHH", payload[14:30])
        if hsize < 40 or bits != 8 or width <= 0:
            return None
        flip = height > 0  # positive height => bottom-up row order
        height = abs(height)
        # palette: BGRA entries right after the info header; grayscale ==
        # all three channels equal, so channel 0 is the value
        pal_off = 14 + hsize
        palette = np.frombuffer(
            payload[pal_off : pal_off + 256 * 4], dtype=np.uint8
        ).reshape(-1, 4)[:, 0]
        stride = (width + 3) & ~3
        pix = np.frombuffer(
            payload[offset : offset + stride * height], dtype=np.uint8
        ).reshape(height, stride)[:, :width]
        if flip:
            pix = pix[::-1]
        # palette lookup stays inside the try: a truncated palette plus
        # out-of-range pixel indices must yield None (junk tolerance), not
        # an IndexError that fails the whole mapInPandas batch
        return palette[pix]
    except Exception:
        return None


PIXEL_SCHEMA = (
    "doc_id long, n_pixels long, pixel_sum long, pixel_min int, pixel_max int"
)

AHASH_GRID = 6  # 6×6 sampled grid → 36-bit hash (fits a signed long)


def ahash_real(media: DataFrame, grid: int = AHASH_GRID) -> DataFrame:
    """Perceptual AVERAGE-HASH from the REAL decoded raster (the standard
    cheap image near-dup fingerprint): nearest-neighbor-sample the pixel
    grid at (i·h/G, j·w/G), threshold each sample against the sampled
    mean, pack the bits row-major into one long. Sampling (not block
    means) keeps every grid cell defined for images smaller than the
    grid, and keeps the whole computation integer-exact up to one
    float division — which is what lets a SQL oracle reproduce the hash
    bit-for-bit from the fixture's closed-form raster. Junk payloads
    yield a null hash instead of failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for k in range(len(pdf)):
                raw = bytes(pdf["payload"].iloc[k])
                px = decode_png_pixels(raw)
                if px is None:
                    px = decode_bmp_pixels(raw)
                ids.append(int(pdf["doc_id"].iloc[k]))
                if px is None or px.size == 0:
                    hashes.append(None)
                    continue
                h, w = px.shape
                samples = [
                    int(px[(i * h) // grid][(j * w) // grid])
                    for i in range(grid)
                    for j in range(grid)
                ]
                mean = sum(samples) / float(grid * grid)
                bits = 0
                for idx, v in enumerate(samples):
                    if v > mean:
                        bits |= 1 << idx
                hashes.append(bits)
            yield pd.DataFrame(
                {"doc_id": ids, "ahash": pd.array(hashes, dtype="Int64")}
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id long, ahash long"
    )


def pixel_stats_real(media: DataFrame) -> DataFrame:
    """REAL pixel-level feature extraction via mapInPandas: rasterizes the
    actual payload bytes (PNG via zlib-inflate + unfilter, BMP via palette
    + padded rows — both stdlib) and aggregates integer-exact pixel stats.
    Junk payloads yield null rows rather than failing the batch. Per-batch
    cost is pure Python over the scanlines — fine for the fixture's tiny
    tiles; a raster-heavy corpus would swap the per-payload body for a
    codec library, keeping this exact plan shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"],
                "n_pixels": pd.array([None] * len(pdf), dtype="Int64"),
                "pixel_sum": pd.array([None] * len(pdf), dtype="Int64"),
                "pixel_min": pd.array([None] * len(pdf), dtype="Int32"),
                "pixel_max": pd.array([None] * len(pdf), dtype="Int32"),
            }
            for k, payload in enumerate(pdf["payload"]):
                raw = bytes(payload)
                px = decode_png_pixels(raw)
                if px is None:
                    px = decode_bmp_pixels(raw)
                if px is None or px.size == 0:
                    continue
                out["n_pixels"][k] = int(px.size)
                out["pixel_sum"][k] = int(px.astype("int64").sum())
                out["pixel_min"][k] = int(px.min())
                out["pixel_max"][k] = int(px.max())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=PIXEL_SCHEMA)


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A genuine BITMAPINFOHEADER 8-bit grayscale BMP via struct only."""
    import struct

    row = (width + 3) & ~3  # rows pad to 4 bytes
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    # positive biHeight => rows are stored bottom-up, so emit y = h-1 .. 0
    # for the image to read (x + y + seed) % 256 at image position (x, y)
    pixels = b"".join(
        bytes((x + y + seed) % 256 for x in range(width)) + b"\x00" * (row - width)
        for y in reversed(range(height))
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


def synthesize_png_media(
    docs: DataFrame, id_col: str = "doc_id", filter_mode: str = "none"
) -> DataFrame:
    """Arrow-batched producer of REAL image payloads: one genuine PNG per
    doc, dimensions a pure function of the id (width = 1 + id % 16,
    height = 1 + (id // 16) % 16) so downstream decode is value-checkable
    without shipping binary fixtures. ``filter_mode="cycle"`` rotates the
    scanline filter through all five PNG filter types (see make_png)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = [
                make_png(
                    int(1 + i % 16),
                    int(1 + (i // 16) % 16),
                    seed=int(i),
                    filter_mode=filter_mode,
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": "image/png",
                }
            )

    # fanout BEFORE the Python stage: the fixture parquet is one row group,
    # so without the pinned exchange the payload synthesis — and every
    # chained mapInPandas decode downstream (same partitioning, no shuffle
    # between them) — serializes on a single Arrow task (profiled r14:
    # the whole mm_ahash tier single-task). Per-row synthesis/decode is a
    # pure function of doc_id, so partitioning cannot change any value.
    from .operators.dedup import fanout

    return fanout(docs.select(F.col(id_col))).mapInPandas(
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


# ---------------------------------------------------------------------------
# Real audio bytes: stdlib-only WAV (RIFF/PCM16) synthesis + parse + features
# ---------------------------------------------------------------------------
# Same philosophy as the PNG path: no audio library is needed to write a
# spec-valid PCM WAV (RIFF header via struct, little-endian int16 samples)
# or to read one back, and the interesting pipeline stages — header parse,
# PCM feature extraction (energy, zero crossings, RMS) — operate on the
# actual bytes. Samples are a closed-form function of (doc_id, index), so
# an oracle can hash-check the extracted features without binary fixtures.


def make_wav(sample_rate: int, n_frames: int, channels: int, seed: int = 0) -> bytes:
    """A genuine PCM16 WAV: RIFF/WAVE + fmt chunk + data chunk. Interleaved
    sample i (across frames × channels) = ((seed*31 + i*7919) % 65536) - 32768."""
    import struct

    n = n_frames * channels
    pcm = struct.pack(
        "<%dh" % n, *(((seed * 31 + i * 7919) % 65536) - 32768 for i in range(n))
    )
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes):
    """Parse real WAV bytes: returns (sample_rate, channels, n_frames,
    samples: np.ndarray[int16]) or None for non-WAV/invalid payloads."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, channels, pcm = 12, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt " and size >= 16:
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if bits != 16:
                return None
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if rate is None or channels in (None, 0) or pcm is None:
        return None
    samples = np.frombuffer(pcm, dtype="<i2")
    return int(rate), int(channels), len(samples) // int(channels), samples


def synthesize_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched producer of REAL audio payloads: one genuine PCM WAV
    per doc; rate/channels/length are pure functions of the id
    (rate = 8000*(1 + id%3), channels = 1 + id%2, frames = 200 + id%100)
    so downstream feature extraction is value-checkable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = [
                make_wav(
                    8000 * (1 + int(i) % 3),
                    200 + int(i) % 100,
                    1 + int(i) % 2,
                    seed=int(i),
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "media_type": "audio/wav"}
            )

    # fanout BEFORE the Python stage: the fixture parquet is one row group,
    # so without the pinned exchange the payload synthesis — and every
    # chained mapInPandas decode downstream (same partitioning, no shuffle
    # between them) — serializes on a single Arrow task (profiled r14:
    # the whole mm_ahash tier single-task). Per-row synthesis/decode is a
    # pure function of doc_id, so partitioning cannot change any value.
    from .operators.dedup import fanout

    return fanout(docs.select(F.col(id_col))).mapInPandas(
        batches, schema="doc_id long, payload binary, media_type string"
    )


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_frames int, "
    "energy long, zero_crossings long, rms double"
)


def audio_features_real(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction via mapInPandas: parses the actual
    RIFF bytes, then computes integer-exact features over the PCM stream —
    total energy (sum of squared samples, exact in int64), zero crossings
    (strict sign changes), and RMS (sqrt of mean square; IEEE sqrt is
    correctly rounded, so the double is cross-engine bit-stable, rounded
    half-up at 1e-4 for belt-and-braces). Junk payloads yield null rows
    rather than failing the batch."""
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"],
                "sample_rate": pd.array([None] * len(pdf), dtype="Int32"),
                "channels": pd.array([None] * len(pdf), dtype="Int32"),
                "n_frames": pd.array([None] * len(pdf), dtype="Int32"),
                "energy": pd.array([None] * len(pdf), dtype="Int64"),
                "zero_crossings": pd.array([None] * len(pdf), dtype="Int64"),
                "rms": pd.array([None] * len(pdf), dtype="Float64"),
            }
            for k, payload in enumerate(pdf["payload"]):
                parsed = parse_wav(bytes(payload))
                if parsed is None:
                    continue
                rate, channels, n_frames, x = parsed
                xl = x.astype(np.int64)
                energy = int((xl * xl).sum())
                zc = int(((xl[1:] * xl[:-1]) < 0).sum())
                rms = math.sqrt(energy / len(xl)) if len(xl) else 0.0
                out["sample_rate"][k] = rate
                out["channels"][k] = channels
                out["n_frames"][k] = n_frames
                out["energy"][k] = energy
                out["zero_crossings"][k] = zc
                out["rms"][k] = math.floor(rms * 1e4 + 0.5) / 1e4
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


def decode_media_arrow(media: DataFrame) -> DataFrame:
    """Arrow-NATIVE decode via ``mapInArrow`` (Spark 3.3+): consumes raw
    ``pyarrow.RecordBatch``es — no pandas materialization at all — and
    parses the same real container headers as :func:`decode_media_real`.
    The zero-copy variant matters for binary-heavy columns: pandas wraps
    each payload in a Python bytes object per row, while Arrow batches
    keep them in one contiguous buffer until the parser touches them."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bytes", pa.int64()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("format", pa.string()),
        ]
    )

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in it:
            doc_ids = rb.column(rb.schema.get_field_index("doc_id"))
            payloads = rb.column(rb.schema.get_field_index("payload"))
            widths, heights, formats, sizes = [], [], [], []
            for p in payloads:
                raw = p.as_py()
                sizes.append(len(raw))
                parsed = parse_image_header(raw)
                widths.append(parsed[0] if parsed else None)
                heights.append(parsed[1] if parsed else None)
                formats.append(parsed[2] if parsed else None)
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(sizes, pa.int64()),
                    pa.array(widths, pa.int32()),
                    pa.array(heights, pa.int32()),
                    pa.array(formats, pa.string()),
                ],
                schema=out_schema,
            )

    return media.mapInArrow(batches, schema=DECODED_SCHEMA)
