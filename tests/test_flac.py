"""FLAC codec tests (round 5, second half) — ground truth without ffmpeg.

FLAC is lossless, so the primary oracle is bit-exact PCM equality through
a real spec-conformant stream, with THREE independent integrity layers the
decoder enforces on every decode: frame-header CRC-8, whole-frame CRC-16,
and the STREAMINFO MD5 of the original interleaved PCM (a one-way check
the decoder can only satisfy by reproducing the input exactly). The
hand-assembled fixture below is built byte-by-byte from RFC 9639's layout
with its own CRC implementations — the decoder is exercised with zero
involvement from our encoder."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigquery_etl_fork_spark.operators.flac import (  # noqa: E402
    decode_flac,
    encode_flac,
)

RNG = np.random.default_rng(5)
MONO = RNG.integers(-30000, 30000, size=(777,)).astype(np.int64)
STEREO = RNG.integers(-30000, 30000, size=(512, 2)).astype(np.int64)


def roundtrip(x, **kw):
    out, rate, bps = decode_flac(encode_flac(x, **kw))
    x2 = np.asarray(x)
    if x2.ndim == 1:
        x2 = x2[:, None]
    assert np.array_equal(out, x2), kw
    return rate, bps


@pytest.mark.parametrize(
    "kw",
    [
        {"subframe": "verbatim"},
        {"subframe": "fixed_0"},
        {"subframe": "fixed_1"},
        {"subframe": "fixed_2"},
        {"subframe": "fixed_3"},
        {"subframe": "fixed_4"},
        {"subframe": "lpc", "lpc": ([3, -3, 1], 1, 5)},
        {"subframe": "fixed_1", "escape_bits": 17},  # escaped raw partitions
        {"subframe": "fixed_2", "partition_order": 2, "block_size": 256},
        {"block_size": 192},  # multi-frame + coded blocksize table
        {"block_size": 250},  # blocksize needing the 16-bit follow field
    ],
)
def test_mono_roundtrip_exact(kw):
    n = 512 if "partition_order" in kw else 777
    roundtrip(MONO[:n], **kw)


@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes_exact(stereo):
    rate, bps = roundtrip(STEREO, subframe="fixed_2", stereo=stereo)
    assert (rate, bps) == (16000, 16)


def test_constant_subframe_compresses_and_is_exact():
    const = np.full(300, -1234, np.int64)
    blob = encode_flac(const, subframe="constant")
    out, _, _ = decode_flac(blob)
    assert (out[:, 0] == -1234).all()
    # 300 16-bit samples = 600 raw bytes; CONSTANT stores one value/frame
    assert len(blob) < 100


def test_wasted_bits_path():
    even = (RNG.integers(-15000, 15000, size=(400,)) * 2).astype(np.int64)
    roundtrip(even, subframe="wasted")


@pytest.mark.parametrize("bps,lo,hi", [(8, -100, 100), (24, -(2**22), 2**22)])
def test_other_bit_depths(bps, lo, hi):
    x = RNG.integers(lo, hi, size=(300,)).astype(np.int64)
    assert roundtrip(x, bps=bps)[1] == bps


def test_odd_sample_rate_uses_follow_field():
    assert roundtrip(MONO[:256], rate=11025)[0] == 11025


# ---- hand-assembled stream: decoder-only, zero encoder involvement ----


def test_crc_spec_vectors():
    """Anchor the production CRCs to published catalog check values, so the
    helpers below (structurally similar to production) can't validate a
    shared polynomial/init/shift bug (ADVICE r5): FLAC's frame-header CRC-8
    is CRC-8/SMBUS (poly 0x07, init 0, MSB-first) with check value 0xF4 over
    b'123456789'; the frame CRC-16 is CRC-16/UMTS a.k.a. BUYPASS (poly
    0x8005, init 0, MSB-first) with check value 0xFEE8."""
    from bigquery_etl_fork_spark.operators.flac import _crc8 as prod_crc8
    from bigquery_etl_fork_spark.operators.flac import _crc16 as prod_crc16

    assert prod_crc8(b"123456789") == 0xF4
    assert prod_crc16(b"123456789") == 0xFEE8
    assert prod_crc8(b"") == 0 and prod_crc16(b"") == 0
    # one multi-byte non-ASCII vector, computed independently (bitwise
    # long-division by hand is impractical; these pin byte-order handling)
    assert prod_crc8(bytes(range(16))) == _crc8(bytes(range(16)))
    assert prod_crc16(bytes(range(16))) == _crc16(bytes(range(16)))


def _crc8(data):  # helper mirror of the spec polynomial (anchored above)
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _hand_stream() -> bytes:
    """192 samples of 4660 @8kHz mono 16-bit, one CONSTANT subframe,
    assembled field-by-field from RFC 9639 §8.2/§9.1."""
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | 192  # rate|ch-1|bps-1|total
    streaminfo = (
        struct.pack(">HH", 192, 192) + b"\x00" * 6 + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    meta = bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo
    # sync(14)=0x3FFE, reserved(1)=0, blocking(1)=0 -> FF F8;
    # blocksize code 1 (192) | rate code 4 (8 kHz) -> 0x14;
    # channels 0 (mono) | size code 4 (16-bit) | reserved -> 0x08; frame #0
    head = bytes([0xFF, 0xF8, 0x14, 0x08, 0x00])
    head += bytes([_crc8(head)])
    sub = bytes([0x00]) + struct.pack(">h", 4660)  # CONSTANT, value 4660
    frame = head + sub
    frame += struct.pack(">H", _crc16(frame))
    return b"fLaC" + meta + frame


def test_hand_assembled_stream_decodes():
    out, rate, bps = decode_flac(_hand_stream())
    assert out.shape == (192, 1) and rate == 8000 and bps == 16
    assert (out == 4660).all()


def test_crc_tamper_is_detected():
    blob = bytearray(_hand_stream())
    blob[-4] ^= 0x01  # flip a bit inside the constant value
    with pytest.raises(NotImplementedError, match="CRC-16"):
        decode_flac(bytes(blob))


def test_md5_integrity_check_fires():
    x = RNG.integers(-1000, 1000, size=(300,)).astype(np.int64)
    blob = bytearray(encode_flac(x))
    # corrupt one MD5 byte in STREAMINFO (offset: fLaC + 4-byte block
    # header + 18 bytes before the digest)
    blob[4 + 4 + 18] ^= 0xFF
    with pytest.raises(NotImplementedError, match="MD5"):
        decode_flac(bytes(blob))
    out, _, _ = decode_flac(bytes(blob), verify_md5=False)
    assert np.array_equal(out[:, 0], x)


def test_not_flac_raises():
    with pytest.raises(NotImplementedError):
        decode_flac(b"OggS" + b"\x00" * 40)


def test_spark_decode_media_flac(spark):
    from bigquery_etl_fork_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    pcm = RNG.integers(-20000, 20000, size=(200, 2)).astype(np.int64)
    blob = encode_flac(pcm, rate=22050, block_size=256)
    df = spark.createDataFrame(
        [(0, "audio", bytearray(blob), (200, 22050, 2, len(blob)))],
        schema=MEDIA_SCHEMA,
    )
    got = decode_media(df).collect()[0]
    assert (got["width"], got["height"], got["channels"]) == (200, 22050, 2)
    expect = float(np.abs(pcm).mean() / 32768.0)
    assert abs(got["mean_intensity"] - expect) < 1e-3
    assert got["ok"]


@pytest.mark.parametrize("bps,lo,hi", [(12, -2000, 2000), (20, -(2**18), 2**18)])
def test_non_byte_aligned_depths(bps, lo, hi):
    """12/20-bit decode through the same generic paths (docstring claim).
    The encoder writes the spec's unset all-zero MD5 for these depths;
    CRC-8/16 still verify every frame."""
    x = RNG.integers(lo, hi, size=(300,)).astype(np.int64)
    blob = encode_flac(x, bps=bps)
    # STREAMINFO md5 region (fLaC + block header + 18 bytes in) is unset
    assert blob[4 + 4 + 18:4 + 4 + 34] == b"\x00" * 16
    assert roundtrip(x, bps=bps)[1] == bps
