"""Multimodal columns: opaque binary media + typed metadata, Arrow-batched.

Media (image/audio/video) are carried as ``binary`` columns with a typed
metadata struct, processed by ``mapInPandas`` (Arrow batch in/out — never
per-row Python). The Spark-side plumbing (schemas, batch iteration, UDF
signatures, partitioning) is real and tested; the codec itself is gated:
with Pillow/torchaudio absent in this environment, a deterministic
header-parser stands in (``FAKE_MAGIC`` blobs produced by
``synth_media_table``), and real decoders raise ``NotImplementedError``
until the libraries are installed.

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


def _decode_blob(blob: bytes) -> tuple[int, int, int, float, bool]:
    """Stub decoder for the deterministic fake format. Real image decode
    (PIL) is intentionally not wired in this environment."""
    if blob is None or blob[:4] != FAKE_MAGIC:
        try:
            import PIL  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "real image decode requires Pillow; only FAKE_MAGIC blobs "
                "are decodable in this environment"
            ) from None
        raise NotImplementedError("real decode path not implemented")
    w, h, c = struct.unpack("<HHB", blob[4:9])
    payload = np.frombuffer(blob[9:], dtype=np.uint8)
    return w, h, c, float(payload.mean()) if len(payload) else 0.0, True


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
