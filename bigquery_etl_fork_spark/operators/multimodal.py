"""Multimodal columns: opaque binary media + typed metadata, Arrow-batched.

Media (image/audio/video) are carried as ``binary`` columns with a typed
metadata struct, processed by ``mapInPandas`` (Arrow batch in/out — never
per-row Python). The Spark-side plumbing (schemas, batch iteration, UDF
signatures, partitioning) is real and tested, and so is the decode step for
uncompressed public formats — pure numpy, no external codec libraries:

- netpbm binary images (``P5`` grayscale / ``P6`` RGB): header parse +
  ``np.frombuffer`` pixel plane;
- RIFF/WAVE PCM audio (8/16-bit): chunk walk + vectorized amplitude stats;
- the deterministic ``MM01`` fake format (``synth_media_table``) kept for
  plumbing tests.

COMPRESSED formats (JPEG/PNG/MP3/...) are the only gated path: they need
Pillow/torchaudio, absent in this environment, so they raise
``NotImplementedError`` until installed.

Fake blob layout (little-endian): magic ``MM01`` | u16 width | u16 height |
u8 channels | payload bytes (one per pixel-ish unit).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FAKE_MAGIC = b"MM01"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic fake media blobs (header + payload)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h, c = int(rng.integers(2, 32)), int(rng.integers(2, 32)), int(rng.integers(1, 4))
        payload = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        blob = FAKE_MAGIC + struct.pack("<HHB", w, h, c) + payload
        rows.append((i, "image", blob, (w, h, c, len(blob))))
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows]),
            "media": pa.array([r[2] for r in rows], pa.binary()),
            "meta": pa.array(
                [
                    {"width": m[0], "height": m[1], "channels": m[2], "n_bytes": m[3]}
                    for *_ignored, m in [(r[0], r[1], r[2], r[3]) for r in rows]
                ],
                pa.struct(
                    [
                        ("width", pa.int32()),
                        ("height", pa.int32()),
                        ("channels", pa.int32()),
                        ("n_bytes", pa.int64()),
                    ]
                ),
            ),
        }
    )


def synth_netpbm(w: int, h: int, channels: int = 1, seed: int = 0) -> bytes:
    """A valid binary netpbm blob (P5 gray / P6 rgb) with random pixels."""
    rng = np.random.default_rng(seed)
    magic = b"P5" if channels == 1 else b"P6"
    header = magic + f"\n# synth\n{w} {h}\n255\n".encode("ascii")
    return header + rng.integers(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()


def synth_wav(n_frames: int, rate: int = 16000, channels: int = 1, seed: int = 0) -> bytes:
    """A valid 16-bit PCM RIFF/WAVE blob with random samples."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n_frames * channels, dtype=np.int16)
    data = samples.tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_real_media_table(n: int = 24, seed: int = 17) -> pa.Table:
    """Mixed REAL-format media blobs (netpbm images + PCM WAV audio) for
    end-to-end decode tests — same MEDIA_SCHEMA as the fake table."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 == 2:
            frames, ch = int(rng.integers(64, 512)), int(rng.integers(1, 3))
            blob = synth_wav(frames, channels=ch, seed=i)
            rows.append((i, "audio", blob, (frames, 16000, ch, len(blob))))
        else:
            w, h = int(rng.integers(2, 48)), int(rng.integers(2, 48))
            ch = 1 if i % 3 == 0 else 3
            blob = synth_netpbm(w, h, ch, seed=i)
            rows.append((i, "image", blob, (w, h, ch, len(blob))))
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows]),
            "media": pa.array([r[2] for r in rows], pa.binary()),
            "meta": pa.array(
                [
                    {"width": m[0], "height": m[1], "channels": m[2], "n_bytes": m[3]}
                    for _i, _k, _b, m in rows
                ],
                pa.struct(
                    [
                        ("width", pa.int32()),
                        ("height", pa.int32()),
                        ("channels", pa.int32()),
                        ("n_bytes", pa.int64()),
                    ]
                ),
            ),
        }
    )


def _parse_netpbm(blob: bytes) -> tuple[int, int, int, float, bool]:
    """Binary netpbm (P5 grayscale / P6 RGB): ASCII header (width height
    maxval, # comments allowed) then a raw pixel plane."""
    c = 1 if blob[:2] == b"P5" else 3
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(int(blob[i:j]))
        i = j
    w, h, maxval = tokens
    i += 1  # exactly one whitespace byte after maxval, per spec
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * c, offset=i)
    return w, h, c, float(px.mean()) if len(px) else 0.0, True


def _parse_wav(blob: bytes) -> tuple[int, int, int, float, bool]:
    """RIFF/WAVE PCM (8/16-bit): walk the chunk list, fmt + data. Mapped
    onto the generic decode schema as (n_frames, sample_rate, channels,
    mean normalized |amplitude|)."""
    channels = rate = bits = None
    data = None
    i = 12
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        size = struct.unpack("<I", blob[i + 4 : i + 8])[0]
        body = blob[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1:
                raise NotImplementedError("only PCM WAV supported")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or channels is None:
        raise NotImplementedError("malformed WAV: missing fmt/data chunk")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit WAV not supported")
    frames = len(x) // channels
    mean = float(np.abs(x).mean()) if len(x) else 0.0
    return frames, rate, channels, mean, True


def _decode_blob(blob: bytes) -> tuple[int, int, int, float, bool]:
    """Dispatch on magic bytes. Uncompressed formats decode in pure numpy;
    compressed formats are the only path still gated on Pillow."""
    if blob is None:
        raise NotImplementedError("null media blob")
    if blob[:4] == FAKE_MAGIC:
        w, h, c = struct.unpack("<HHB", blob[4:9])
        payload = np.frombuffer(blob[9:], dtype=np.uint8)
        return w, h, c, float(payload.mean()) if len(payload) else 0.0, True
    if blob[:2] in (b"P5", b"P6"):
        return _parse_netpbm(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _parse_wav(blob)
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "compressed-format decode requires Pillow; netpbm/WAV/fake blobs "
            "decode natively in this environment"
        ) from None
    raise NotImplementedError("compressed decode path not implemented")


def decode_media(df: DataFrame, batch_hook=None) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_hook is not None:
                batch_hook(len(pdf))
            out = {
                "media_id": pdf["media_id"],
                "width": [], "height": [], "channels": [],
                "mean_intensity": [], "ok": [],
            }
            for blob in pdf["media"]:
                try:
                    w, h, c, mi, ok = _decode_blob(bytes(blob))
                except NotImplementedError:
                    w = h = c = 0
                    mi, ok = 0.0, False
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["mean_intensity"].append(round(mi, 4))
                out["ok"].append(ok)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """'Resize' fake media: rewrite header + subsample payload (the real
    implementation would call the codec; the Spark plumbing — binary in,
    binary out, metadata struct rebuilt — is identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media_out, meta_out = [], []
            for blob in pdf["media"]:
                blob = bytes(blob)
                if blob[:4] != FAKE_MAGIC:
                    media_out.append(None)
                    meta_out.append(None)
                    continue
                _w, _h, c = struct.unpack("<HHB", blob[4:9])
                payload = np.frombuffer(blob[9:], dtype=np.uint8)
                n = target_w * target_h
                idx = np.linspace(0, max(len(payload) - 1, 0), n).astype(int)
                new_payload = payload[idx] if len(payload) else np.zeros(n, np.uint8)
                nb = FAKE_MAGIC + struct.pack("<HHB", target_w, target_h, c) + new_payload.tobytes()
                media_out.append(nb)
                meta_out.append(
                    {"width": target_w, "height": target_h, "channels": int(c), "n_bytes": len(nb)}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "media": media_out,
                    "meta": meta_out,
                }
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)
