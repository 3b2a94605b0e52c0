"""Baseline JPEG codec tests (round 5) — ground truth without Pillow.

With an all-ones quant table the JPEG pipeline is analytically exact for
solid 8x8 blocks (the DCT of a constant block is DC-only, quantization by
1 is lossless, the IDCT inverts exactly), and bounded for arbitrary
content (coefficient rounding contributes |Δ|≤1 per channel in
YCbCr space, ≤2 after the color transform). Every assertion below is
derived from those analytic facts — no external reference decoder."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigquery_etl_fork_spark.operators.jpeg import (  # noqa: E402
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def test_solid_gray_roundtrip_exact():
    a = np.full((16, 24), 100, np.uint8)
    assert np.array_equal(decode_baseline_jpeg(encode_baseline_jpeg(a, quant=1)), a)


def test_blockwise_constant_gray_exact():
    # every 8x8 block a different constant -> all blocks DC-only -> exact
    vals = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20 + 5
    a = np.kron(vals, np.ones((8, 8), np.uint8))
    assert np.array_equal(decode_baseline_jpeg(encode_baseline_jpeg(a, quant=1)), a)


def test_random_gray_bounded_error():
    a = np.random.default_rng(0).integers(0, 256, (32, 40), dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(a, quant=1))
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 1


def test_odd_dimensions_pad_and_crop():
    a = np.full((13, 11), 77, np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(a, quant=1))
    assert d.shape == (13, 11) and np.array_equal(d, a)


def test_rgb_444_bounded_error():
    a = np.random.default_rng(1).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(a, quant=1))
    assert d.shape == a.shape
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 2


def test_rgb_420_solid_color():
    a = np.zeros((32, 48, 3), np.uint8)
    a[...] = (200, 50, 120)
    d = decode_baseline_jpeg(encode_baseline_jpeg(a, quant=1, subsampling="420"))
    assert d.shape == a.shape
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 1


def test_restart_intervals_resync_all_layouts():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (40, 24), dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(g, quant=1, restart_interval=3))
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 1
    c = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(c, quant=1, restart_interval=2))
    assert int(np.abs(d.astype(int) - c.astype(int)).max()) <= 2
    sol = np.zeros((32, 32, 3), np.uint8)
    sol[...] = (9, 200, 33)
    d = decode_baseline_jpeg(
        encode_baseline_jpeg(sol, quant=1, subsampling="420", restart_interval=1)
    )
    assert int(np.abs(d.astype(int) - sol.astype(int)).max()) <= 1


def test_nontrivial_quant_table_mid_gray_exact():
    # DC of a 128-block is 0, every AC is 0: any quant table is lossless
    q = np.full((8, 8), 16, np.int64)
    a = np.full((16, 16), 128, np.uint8)
    assert np.array_equal(decode_baseline_jpeg(encode_baseline_jpeg(a, quant=q)), a)


def test_unsupported_paths_raise():
    a = np.full((8, 8), 1, np.uint8)
    blob = bytearray(encode_baseline_jpeg(a, quant=1))
    # flip SOF0 -> SOF2 (progressive) marker
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_baseline_jpeg(bytes(blob))
    with pytest.raises(NotImplementedError, match="SOI"):
        decode_baseline_jpeg(b"\x00\x01")


def test_property_roundtrip_bounded_error_sweep():
    """Property sweep (seeded, deterministic): any uint8 content, any of
    the supported layouts, encode→decode stays within the analytic error
    bound (gray ≤1, RGB ≤2 via the color-transform amplification)."""
    rng = np.random.default_rng(42)
    for trial in range(12):
        h = int(rng.integers(1, 41))
        w = int(rng.integers(1, 41))
        gray = bool(rng.integers(0, 2))
        ri = int(rng.integers(0, 4))
        if gray:
            a = rng.integers(0, 256, (h, w), dtype=np.uint8)
            bound, sub = 1, "444"
        elif rng.integers(0, 2):
            # 4:2:0's 2x2 chroma averaging is only analytically invertible
            # for chroma constant within each MCU: random color per 16x16
            # tile (averaging lossless, per-channel bound holds)
            sub, bound = "420", 2
            th, tw = -(-h // 16), -(-w // 16)
            tiles = rng.integers(0, 256, (th, tw, 3), dtype=np.uint8)
            a = np.kron(tiles, np.ones((16, 16, 1), np.uint8))[:h, :w]
        else:
            a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            sub, bound = "444", 2
        blob = encode_baseline_jpeg(a, quant=1, subsampling=sub, restart_interval=ri)
        d = decode_baseline_jpeg(blob)
        assert d.shape == a.shape, (trial, h, w, gray, sub, ri)
        err = int(np.abs(d.astype(int) - a.astype(int)).max())
        assert err <= bound, (trial, h, w, gray, sub, ri, err)
