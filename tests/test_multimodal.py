"""Stdlib media codec unit tests: full PNG/BMP rasterization round trips.

The synthesizers and decoders in ``multimodal.py`` are the real-bytes
backbone of the mm_* queries; these tests pin the codec layer itself
(no Spark session needed):

- every one of the five PNG scanline filter types must invert exactly
  (a wrong Paeth/Average inverse corrupts pixels silently — the
  mm_pixel_stats oracle would catch it at query level, these catch it at
  the function level with a per-filter attribution);
- BMP bottom-up row order and 4-byte row padding;
- junk tolerance: corrupt/foreign payloads decode to None, never raise
  (corpus hygiene — a 100 TB crawl always contains junk).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from move_forecast_ind_spark import multimodal as M


def _expected(w: int, h: int, seed: int) -> np.ndarray:
    return np.array(
        [[(x + y + seed) % 256 for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )


@pytest.mark.parametrize("w,h,seed", [(1, 1, 0), (16, 16, 7), (5, 9, 123), (1, 16, 999), (16, 1, 42)])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_round_trip(w, h, seed, mode):
    got = M.decode_png_pixels(M.make_png(w, h, seed, filter_mode=mode))
    assert got is not None
    assert got.dtype == np.uint8
    assert (got == _expected(w, h, seed)).all()


def _png_single_filter(w: int, h: int, seed: int, ftype: int) -> bytes:
    """A PNG whose every scanline uses exactly one filter type, so a wrong
    inverse is attributable to that type alone."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    parts, prior = [], bytes(w)
    for y in range(h):
        raw = bytes((x + y + seed) % 256 for x in range(w))
        parts.append(bytes((ftype,)) + M._png_filter_row(ftype, raw, prior))
        prior = raw
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_every_filter_type_inverts(ftype):
    got = M.decode_png_pixels(_png_single_filter(11, 7, 55, ftype))
    assert got is not None
    assert (got == _expected(11, 7, 55)).all()


@pytest.mark.parametrize("w,h,seed", [(1, 1, 0), (16, 16, 7), (13, 4, 100), (6, 2, 1)])
def test_bmp_round_trip(w, h, seed):
    got = M.decode_bmp_pixels(M.make_bmp(w, h, seed))
    assert got is not None
    assert (got == _expected(w, h, seed)).all()


def test_junk_payloads_decode_to_none():
    assert M.decode_png_pixels(b"junk") is None
    assert M.decode_png_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) is None
    assert M.decode_bmp_pixels(b"BM" + b"\x00" * 10) is None
    # truncated IDAT: valid signature/IHDR but the inflate fails
    good = M.make_png(8, 8, 3)
    assert M.decode_png_pixels(good[: len(good) - 20]) is None


def test_decode_image_real_dispatch():
    assert M.decode_image_real(M.make_png(4, 3, 9)) == (4, 3, "png")
    assert M.decode_image_real(M.make_bmp(6, 2, 1)) == (6, 2, "bmp")
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\xff\xd8\xff\xe0junk")  # JPEG: codec-gated


def test_header_parse_agrees_with_raster_dims():
    for w, h, seed in [(3, 5, 2), (16, 16, 0)]:
        png = M.make_png(w, h, seed, filter_mode="cycle")
        assert M.parse_image_header(png) == (w, h, "png")
        px = M.decode_png_pixels(png)
        assert px.shape == (h, w)


def test_ahash_groups_pixel_identical_images(spark):
    """Docs congruent mod 256 with equal dimensions are pixel-identical
    PNGs in the fixture (raster = f(doc_id % 256, dims = f(doc_id % 256)))
    — the average-hash MUST put each such pair in one cluster, and the
    clustering must be non-trivial (hashes do distinguish images)."""
    from move_forecast_ind_spark.queries.curation import mm_ahash_dedup

    rows = mm_ahash_dedup(spark, "/root/testdata/sf0.001").collect()
    by_doc = {r.doc_id: r for r in rows}
    pairs = 0
    for d, r in by_doc.items():
        other = by_doc.get(d + 256)
        if other is not None:
            pairs += 1
            assert r.ahash == other.ahash, (d, r.ahash, other.ahash)
            assert r.keeper_doc_id == other.keeper_doc_id
            assert other.is_dup  # the higher id is never the keeper
    assert pairs > 100  # the fixture really exercises the property
    assert len({r.ahash for r in rows}) > 50  # and hashes discriminate


def test_ahash_near_pairs_fence_is_observable(spark):
    """The _AHASH_MAX_DF fence must be OBSERVABLE (no-silent-caps /
    ADVICE r8): mm_ahash_near_pairs attaches an Observation counting
    truncated buckets/docs, readable after any action with zero extra
    jobs. On the sf0.001 fixture nothing reaches the cap, so the
    guarantee-weakening truncation count must be exactly zero — and the
    metric must exist, so a duplicate-heavy corpus reports nonzero (the
    10x probe reads 21 buckets / 138291 docs)."""
    from conftest import SF_SMALL
    from move_forecast_ind_spark.queries import curation
    from move_forecast_ind_spark.queries.registry import REGISTRY

    REGISTRY["mm_ahash_near_pairs"].fn(spark, SF_SMALL).count()
    assert curation.AHASH_FENCE_OBS, "observation handle not registered"
    got = curation.AHASH_FENCE_OBS[0].get
    assert got == {"fenced_buckets": 0, "fenced_docs": 0}
