"""Progressive JPEG codec tests (round 6) — ground truth without Pillow.

The progressive wire format is pure entropy-LAYOUT: the quantized
coefficient domain is identical to baseline sequential. The primary
oracle is therefore cross-pipeline equality — ``decode_progressive(
encode_progressive(px)) == decode_baseline(encode_baseline(px))``
pixel-EXACT for the same quant table: the two paths share only the
DCT/quant kernel and diverge completely at the entropy layer, so an
entropy bug on either side breaks equality. A hand-assembled SOF2
stream (bytes written from the T.81 spec in this file, not by our
encoder) additionally pins the wire format against an explicit
double-loop IDCT, independent of both codec halves.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigquery_etl_fork_spark.operators.jpeg import (  # noqa: E402
    decode_baseline_jpeg,
    decode_jpeg,
    encode_baseline_jpeg,
)
from bigquery_etl_fork_spark.operators.jpeg_progressive import (  # noqa: E402
    encode_progressive_jpeg,
    decode_progressive_jpeg,
)

# Annex K luminance quant table: realistic coefficient sparsity (long
# EOB runs, high-frequency bands mostly zero — the regime progressive
# scans exist for)
K_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)


def _cases():
    rng = np.random.default_rng(42)
    yield "noise-gray", rng.integers(0, 256, (16, 16), np.uint8), "444"
    yield "noise-rgb-odd", rng.integers(0, 256, (24, 17, 3), np.uint8), "444"
    yield "noise-420", rng.integers(0, 256, (20, 20, 3), np.uint8), "420"
    yield "single-block", rng.integers(0, 256, (8, 8), np.uint8), "444"
    yield "odd-420", rng.integers(0, 256, (33, 9, 3), np.uint8), "420"
    grad = (np.add.outer(np.linspace(0, 255, 40), np.linspace(0, 100, 40)) / 2)
    yield "smooth-gray", grad.astype(np.uint8), "444"
    yield "flat-420", np.full((40, 40, 3), 77, np.uint8), "420"


@pytest.mark.parametrize("quant", [1, 16, "K"])
@pytest.mark.parametrize("ri", [0, 3])
def test_progressive_equals_baseline_pixel_exact(quant, ri):
    q = K_LUM if quant == "K" else quant
    for name, px, sub in _cases():
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(px, quant=q, subsampling=sub, restart_interval=ri)
        )
        prog = decode_progressive_jpeg(
            encode_progressive_jpeg(px, quant=q, subsampling=sub, restart_interval=ri)
        )
        assert np.array_equal(base, prog), (name, quant, ri)


def test_deep_successive_approximation_script():
    """Al=2 first scans refined through two successive passes (2->1->0)
    must converge to the exact baseline pixels."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 24, 3), np.uint8)

    def script(ncomp):
        ca = list(range(ncomp))
        s = [(ca, 0, 0, 0, 2)]
        s += [([ci], 1, 63, 0, 2) for ci in range(ncomp)]
        s += [(ca, 0, 0, 2, 1)]
        s += [([ci], 1, 63, 2, 1) for ci in range(ncomp)]
        s += [(ca, 0, 0, 1, 0)]
        s += [([ci], 1, 63, 1, 0) for ci in range(ncomp)]
        return s

    base = decode_baseline_jpeg(encode_baseline_jpeg(px, quant=2))
    prog = decode_progressive_jpeg(
        encode_progressive_jpeg(px, quant=2, scan_script=script(3))
    )
    assert np.array_equal(base, prog)


def test_decode_jpeg_dispatches_on_sof_marker():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 16, 3), np.uint8)
    b = encode_baseline_jpeg(px, quant=1)
    p = encode_progressive_jpeg(px, quant=1)
    assert np.array_equal(decode_jpeg(b), decode_jpeg(p))
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(p)  # baseline-only entry stays honest


def test_truncated_stream_is_a_monotone_preview():
    """The point of progressive: any scan prefix decodes to a coarser
    version of the final image, with error shrinking as scans arrive."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 24, 3), np.uint8)
    blob = encode_progressive_jpeg(px, quant=2)
    sos = [
        i
        for i in range(len(blob) - 1)
        if blob[i] == 0xFF and blob[i + 1] == 0xDA
    ]
    assert len(sos) == 14  # default script: 1 DC + 6 AC + 1 DCr + 6 ACr
    full = decode_progressive_jpeg(blob).astype(int)
    prev = np.inf
    for cut in (sos[1], sos[4], sos[7], sos[10], len(blob)):
        part = decode_progressive_jpeg(blob[:cut], allow_truncated=True)
        err = float(np.abs(part.astype(int) - full).mean())
        assert err <= prev + 1e-9
        prev = err
    assert prev == 0.0  # the full stream, truncation-tolerant path included
    with pytest.raises(NotImplementedError):
        decode_progressive_jpeg(blob[: sos[3]])  # no EOI, no flag -> raise


def test_corruption_contract_only_notimplementederror():
    """decode_media's batch kernel catches exactly NotImplementedError
    (multimodal.py): no corruption may escape as IndexError/KeyError/...
    Same contract the FLAC decoder was hardened to after ADVICE r5."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (24, 24, 3), np.uint8)
    for enc, dec, seed0 in (
        (
            encode_progressive_jpeg,
            lambda b: decode_progressive_jpeg(b, allow_truncated=True),
            0,
        ),
        (encode_baseline_jpeg, decode_jpeg, 10_000),
    ):
        blob = bytearray(enc(px, quant=2, restart_interval=4))
        for trial in range(400):
            b = bytearray(blob)
            r = np.random.default_rng(seed0 + trial)
            mode = trial % 3
            if mode == 0:
                i = int(r.integers(2, len(b)))
                b[i] ^= int(r.integers(1, 256))
            elif mode == 1:
                b = b[: int(r.integers(4, len(b)))]
            else:
                i = int(r.integers(2, len(b)))
                b[i : i + int(r.integers(1, 9))] = bytes(
                    r.integers(0, 256, 4, dtype=np.uint8).tolist()
                )
            try:
                dec(bytes(b))
            except NotImplementedError:
                pass  # the one permitted escape


def _scan_roundtrip(bands, ss, se, al_levels) -> bool:
    """Coefficient-level oracle: encode one AC first scan + refinements
    with the scan writers, decode with the block decoders, compare the
    in-band coefficients exactly. Bypasses DCT/pixels so arbitrary
    coefficient patterns (long zero-history gaps, isolated history
    coefficients, cross-block EOB runs) can be placed directly."""
    from bigquery_etl_fork_spark.operators.jpeg import (
        _ENC_AC,
        _BitReader,
        _build_codes,
    )
    from bigquery_etl_fork_spark.operators.jpeg_progressive import (
        _ScanWriter,
        _decode_ac_first_block,
        _decode_ac_refine_block,
        _write_ac_first,
        _write_ac_refine,
    )

    ac_codes = _build_codes(*_ENC_AC)
    actab = {(ln, c): s for s, (c, ln) in ac_codes.items()}
    n = len(bands)
    cf_src = np.zeros((1, n, 64), np.int32)
    for i, b in enumerate(bands):
        cf_src[0, i] = b
    blocks = [(0, i) for i in range(n)]
    scans = []
    sw = _ScanWriter(ac_codes, 0)
    _write_ac_first(sw, cf_src, blocks, ss, se, al_levels[0])
    scans.append(("first", al_levels[0], sw.done()))
    for al in al_levels[1:]:
        sw = _ScanWriter(ac_codes, 0)
        _write_ac_refine(sw, cf_src, blocks, ss, se, al)
        scans.append(("refine", al, sw.done()))
    cf = np.zeros((1, n, 64), np.int32)
    for kind, al, data in scans:
        rdr = _BitReader(data + b"\xff\xd9", 0)
        eobrun = 0
        for by, bx in blocks:
            band = cf[by, bx, ss : se + 1]
            if kind == "first":
                if eobrun > 0:
                    eobrun -= 1
                else:
                    eobrun = _decode_ac_first_block(rdr, band, actab, ss, se, al)
            else:
                eobrun = _decode_ac_refine_block(
                    rdr, band, actab, ss, se, al, eobrun
                )
    return np.array_equal(cf[:, :, ss : se + 1], cf_src[:, :, ss : se + 1])


def test_refinement_zrl_across_history_gap():
    """The desync the ZRL ordering rule exists for: a history coefficient
    isolated inside a >16-zero gap before a newly-significant one. An
    encoder that flushes ZRLs only at newly-significant positions emits
    the history correction bit after the WRONG symbol and the decoder's
    positional walk desyncs (observed as an invalid-huffman raise before
    the fix)."""
    b = np.zeros(64, int)
    b[1] = -7   # history from level 2 down
    b[30] = 5   # history coefficient inside the zero gap
    b[63] = -1  # newly significant only at the final level
    assert _scan_roundtrip([b], 1, 63, [2, 1, 0])


def test_scan_codec_randomized_coefficient_sweep():
    """600 random multi-block coefficient patterns through every band /
    successive-approximation depth combination — dense, sparse, big gaps,
    all-zero blocks (cross-block EOB runs), corrections under EOB runs."""
    rng = np.random.default_rng(0)
    for t in range(600):
        n = int(rng.integers(1, 6))
        bands = []
        for _ in range(n):
            b = np.zeros(64, int)
            for _ in range(int(rng.integers(0, 10))):
                b[int(rng.integers(1, 64))] = int(rng.integers(-63, 64))
            bands.append(b)
        levels = [[1, 0], [2, 1, 0], [3, 2, 1, 0]][t % 3]
        ss, se = [(1, 63), (1, 5), (6, 63)][(t // 3) % 3]
        assert _scan_roundtrip(bands, ss, se, levels), (t, ss, se, levels)


def _handmade_progressive_stream() -> bytes:
    """An 8x8 grayscale SOF2 stream assembled byte-by-byte from T.81 —
    no codec involvement. Quant all-ones. Two scans:

    - DC scan (Ss=0,Se=0,Ah=0,Al=0): diff=5 -> category 3 (DC table:
      twelve 4-bit canonical codes, symbol k = code k) -> bits 0011 101,
      padded with 1s -> 0x3B.
    - AC scan (Ss=1,Se=63,Ah=0,Al=0): coefficient -2 at zigzag index 1
      -> symbol 0x02 (AC table: 255 nine-bit canonical codes, symbol k =
      code k) -> 000000010 + value bits 01 (-2 encoded as 1 in 2 bits),
      then EOB (symbol 0x00) -> 000000000; 20 bits padded to 0x01 0x20
      0x0F.
    """
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + 12)
        + b"\x00"
        + dc_bits
        + bytes(range(12))
    )
    ac_bits = bytes([0] * 8 + [255, 1] + [0] * 6)
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + 256)
        + b"\x10"
        + ac_bits
        + bytes(range(256))
    )
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0x00])
    out += b"\x3b"
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 1, 63, 0x00])
    out += b"\x01\x20\x0f"
    out += b"\xff\xd9"
    return bytes(out)


def test_handmade_stream_matches_explicit_idct():
    """Wire-format pin independent of our encoder AND of the codec's
    vectorized IDCT: expected pixels computed with the textbook
    double-loop inverse DCT over the two hand-placed coefficients."""
    img = decode_progressive_jpeg(_handmade_progressive_stream())
    assert img.shape == (8, 8)
    # coefficients: DC=5 at (0,0); -2 at zigzag index 1 = (row 0, col 1)
    coef = np.zeros((8, 8))
    coef[0, 0] = 5.0
    coef[0, 1] = -2.0

    def c(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    exp = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) / 4 * coef[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            exp[y, x] = s + 128.0
    exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
    assert np.array_equal(img, exp)


def test_decode_media_handles_progressive_blobs(spark):
    """Spark-side integration: progressive blobs flow through the same
    Arrow-batched mapInPandas kernel, corrupt ones land ok=False."""
    from bigquery_etl_fork_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    rng = np.random.default_rng(21)
    rows = []
    pixels = {}
    for i in range(6):
        w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
        ch = 1 if i % 3 == 0 else 3
        px = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, 3), np.uint8)
        sub = "420" if (ch == 3 and i % 2) else "444"
        blob = encode_progressive_jpeg(px, quant=1, subsampling=sub)
        rows.append((i, "image", bytearray(blob), (w, h, ch, len(blob))))
        pixels[i] = (w, h, ch)
    rows.append((99, "image", bytearray(b"\xff\xd8\xff\xc2corrupt"), (0, 0, 0, 11)))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_media(df).collect()}
    for mid, (w, h, ch) in pixels.items():
        r = got[mid]
        assert (r["width"], r["height"], r["channels"], r["ok"]) == (w, h, ch, True)
    assert got[99]["ok"] is False
