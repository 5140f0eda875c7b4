"""Hypothesis property tests for the algorithmic guarantees behind the
round-4 curation operators — pure-Python replicas of the column logic, so
the invariants are pinned across the whole input space, not just the
fixture corpus."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

# --- deletion-neighborhood blocking completeness ---------------------------


def _variants(s: str) -> set[str]:
    """Replica of _deletion_variants_spark: s plus every 1-deletion."""
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def _lev1(a: str, b: str) -> bool:
    """Edit distance ≤ 1 (insert/delete/substitute/equal)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # substitution
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by 1: b with one char deleted must equal a
    return any(b[:i] + b[i + 1 :] == a for i in range(lb))


words = st.text(alphabet="abcdefg", min_size=1, max_size=8)


@settings(max_examples=300)
@given(words, words)
def test_deletion_blocking_is_complete(a: str, b: str):
    """FastSS soundness: ANY two strings at edit distance ≤ 1 share at
    least one member of their (identity ∪ 1-deletion) variant sets —
    the property that makes the blocked equi-join lossless. (The
    converse need not hold; false candidates are removed by the
    levenshtein verify.)"""
    if _lev1(a, b):
        assert _variants(a) & _variants(b), (a, b)


# --- bloom filter: no false negatives --------------------------------------

_BLOOM_BITS = 1 << 14
_BLOOM_K = 3


def _positions(fp: str) -> list[int]:
    """Replica of _bloom_pos: md5-prefix of fp||'#j' mod m."""
    return [
        int(hashlib.md5(f"{fp}#{j}".encode()).hexdigest()[:8], 16) % _BLOOM_BITS
        for j in range(_BLOOM_K)
    ]


@settings(max_examples=100)
@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=200))
def test_bloom_replica_has_no_false_negatives(keys: list[str]):
    """Every inserted key probes positive — for any key set. (The Spark
    plan computes the identical positions via conv(substr(md5(...))), so
    this pins the scheme, and tests/test_curation.py pins the plan.)"""
    words_bits: dict[int, int] = {}
    for k in keys:
        for p in _positions(k):
            words_bits[p >> 5] = words_bits.get(p >> 5, 0) | (1 << (p & 31))
    for k in keys:
        assert all(
            words_bits.get(p >> 5, 0) & (1 << (p & 31)) for p in _positions(k)
        )


# --- WAV codec: synth/parse round trip over the parameter space ------------


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=8000, max_value=48000),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=10**6),
)
def test_wav_round_trip_property(rate: int, frames: int, ch: int, seed: int):
    from move_forecast_ind_spark.multimodal import make_wav, parse_wav

    parsed = parse_wav(make_wav(rate, frames, ch, seed=seed))
    assert parsed is not None
    r, c, n, x = parsed
    assert (r, c, n) == (rate, ch, frames)
    assert len(x) == frames * ch
    # sample formula round-trips through the int16 little-endian encoding
    for i in (0, len(x) - 1):
        assert int(x[i]) == ((seed * 31 + i * 7919) % 65536) - 32768


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31),
    st.sampled_from(["none", "cycle"]),
)
@settings(max_examples=60, deadline=None)
def test_png_codec_round_trip_property(w, h, seed, mode):
    """make_png → decode_png_pixels inverts to the closed-form raster for
    ARBITRARY (width, height, seed, filter-mode) — pins the unfiltering
    inverses (Sub/Up/Average/Paeth) across shapes the fixture queries
    never hit (wide, tall, large seeds)."""
    import numpy as np

    from move_forecast_ind_spark.multimodal import decode_png_pixels, make_png

    got = decode_png_pixels(make_png(w, h, seed, filter_mode=mode))
    assert got is not None and got.shape == (h, w)
    expect = np.fromfunction(
        lambda y, x: (x + y + seed) % 256, (h, w), dtype=np.int64
    ).astype(np.uint8)
    assert (got == expect).all()


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=60, deadline=None)
def test_png_decoder_never_raises_on_junk(payload):
    """Corpus hygiene: the rasterizer returns None on arbitrary junk —
    including junk that starts with a valid PNG signature — never
    raises."""
    from move_forecast_ind_spark.multimodal import decode_png_pixels

    assert decode_png_pixels(payload) is None
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n" + payload) is None
