"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy.

Closes the multimodal entropy-coded gate without Pillow: a spec-structured
baseline sequential decoder (SOI / DQT / SOF0 / DHT / DRI / SOS segment
walk, canonical-huffman entropy decode with 0xFF00 byte-unstuffing and
RSTn handling, dequantize, inverse zigzag, 8x8 IDCT, 4:4:4 or 4:2:0
chroma upsampling, YCbCr→RGB) plus a matching encoder used to synthesize
deterministic test fixtures. The huffman tables are written into DHT and
read back generically, so the decoder accepts any table set a
spec-compliant encoder would emit (including the Annex K defaults real
encoders use) — our encoder emits simple fixed-length canonical tables
because compression ratio is irrelevant for fixtures.

Honest gating: progressive (SOF2), arithmetic coding, 12-bit precision,
and sampling layouts other than 4:4:4 / 4:2:0 raise NotImplementedError.

Ground truth without an external codec: with an all-ones quant table the
pipeline is exactly invertible for solid 8x8 blocks (DC-only DCT), and
bounded-error (|Δ|≤2) for arbitrary grayscale content — both asserted
analytically in tests, no reference decoder needed.

Reference behavioral spec: the reference repo ships no media plane at
all; this exists for SURVEY §2's multimodal-column operators
(decode/feature-extract over binary columns at 100 TB — the decode
kernel itself is an Arrow-batched mapInPandas UDF in multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_baseline_jpeg", "decode_baseline_jpeg", "decode_jpeg"]


def decode_jpeg(blob: bytes) -> "np.ndarray":
    """Decode a JPEG of either supported coding process: dispatches on
    the frame marker — SOF0 (baseline sequential) decodes here, SOF2
    (progressive huffman) via jpeg_progressive. Other SOFs (extended
    sequential, lossless, arithmetic) raise NotImplementedError."""
    if blob[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xC0:
            return decode_baseline_jpeg(blob)
        if marker == 0xC2:
            from .jpeg_progressive import decode_progressive_jpeg

            return decode_progressive_jpeg(blob)
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xD9, 0xDA):
            # a SOS/EOI before any SOF, or an unsupported coding process
            raise NotImplementedError(
                f"unsupported JPEG coding process (marker 0x{marker:02x})"
            )
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        i += 2 + ln
    raise NotImplementedError("malformed JPEG: no SOF segment")

# zigzag scan order: index i of the scan -> (row, col) flat index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_C = np.array([1 / np.sqrt(2)] + [1.0] * 7)
_DCT = np.array([
    [_C[u] / 2 * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])  # A @ block @ A.T = FDCT;  A.T @ coef @ A = IDCT

# fixture-encoder huffman tables (valid canonical prefix codes, written
# into DHT so any decoder can read them): 12 DC categories at 4 bits,
# all 256 AC run/size symbols at 9 bits
_ENC_DC = ([0] * 3 + [12] + [0] * 12, list(range(12)))
# DHT stores per-length counts as single bytes (<=255), so 256 symbols
# can't all sit at one length: 255 nine-bit codes + 1 ten-bit code
_ENC_AC = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman assignment (T.81 C.2): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs 0xFF00 and
    stops at (reporting) RSTn / other markers."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.n <= 24:
            if self.marker is not None or self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt  # RSTn: caller consumes via reset()
                    continue
                else:
                    self.marker = nxt  # EOI / next segment
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def reset_at_rst(self) -> None:
        """Byte-align past an RSTn marker (restart interval boundary)."""
        assert self.marker is not None and 0xD0 <= self.marker <= 0xD7
        self.pos += 2
        self.marker = None
        self.acc = 0
        self.n = 0

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (ln, code) in table:
                return table[(ln, code)]
        raise NotImplementedError("invalid huffman code in JPEG stream")


def _category(v: int) -> int:
    return 0 if v == 0 else int(v if v > 0 else -v).bit_length()


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_to(arr: np.ndarray, mult: int) -> np.ndarray:
    h, w = arr.shape
    ph, pw = (-h) % mult, (-w) % mult
    return np.pad(arr, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else arr


def _blocks(plane: np.ndarray):
    h, w = plane.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            yield plane[by : by + 8, bx : bx + 8]


def _encode_block(wtr, block, qtab, dc_prev, dc_codes, ac_codes) -> int:
    coef = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    q = np.round(coef / qtab).astype(np.int64).ravel()[_ZIGZAG]
    dc = int(q[0])
    diff = dc - dc_prev
    s = _category(diff)
    c, ln = dc_codes[s]
    wtr.put(c, ln)
    if s:
        wtr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max(np.nonzero(q[1:])[0]) + 1 if np.any(q[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            wtr.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        wtr.put(c, ln)
        wtr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        wtr.put(c, ln)
    return dc


def encode_baseline_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | int | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JFIF-style JPEG. ``quant=1`` (or an all-ones
    table) makes solid blocks exactly invertible — the analytic fixture
    mode. ``subsampling``: '444' or '420' (RGB only).
    ``restart_interval``: emit DRI + RSTn markers every N MCUs (also
    exercises the decoder's restart/resync path)."""
    if quant is None:
        quant = 1
    qtab = (
        np.full((8, 8), int(quant), np.float64)
        if np.isscalar(quant)
        else np.asarray(quant, np.float64).reshape(8, 8)
    )
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if subsampling not in ("444", "420") or (gray and subsampling == "420"):
        raise NotImplementedError(f"unsupported subsampling {subsampling}")

    if gray:
        planes = [_pad_to(arr, 8).astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        mult = 16 if subsampling == "420" else 8
        y = _pad_to(ycc[..., 0], mult)
        cb = _pad_to(ycc[..., 1], mult)
        cr = _pad_to(ycc[..., 2], mult)
        if subsampling == "420":
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (one table, id 0, 8-bit precision): len=2+1+64, Pq/Tq=0x00
    zz_q = qtab.ravel()[_ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(zz_q)
    # SOF0
    ncomp = 1 if gray else 3
    samp = [0x11] * ncomp
    if not gray and subsampling == "420":
        samp = [0x22, 0x11, 0x11]
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, samp[ci], 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 + AC table 0 (shared by every component)
    for cls, (bits, values) in ((0, _ENC_DC), (1, _ENC_AC)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp]) + b"".join(
        struct.pack(">BB", ci + 1, 0x00) for ci in range(ncomp)
    ) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # assemble the MCU sequence (list of (component, 8x8 block) per MCU)
    mcus: list[list] = []
    if gray or subsampling == "444":
        mh, mw = planes[0].shape
        for by in range(0, mh, 8):
            for bx in range(0, mw, 8):
                mcus.append(
                    [(ci, p[by : by + 8, bx : bx + 8]) for ci, p in enumerate(planes)]
                )
    else:  # 420 MCU: 4 Y blocks then Cb, Cr
        y, cb, cr = planes
        for by in range(0, y.shape[0], 16):
            for bx in range(0, y.shape[1], 16):
                mcu = [
                    (0, y[by + dy : by + dy + 8, bx + dx : bx + dx + 8])
                    for dy, dx in ((0, 0), (0, 8), (8, 0), (8, 8))
                ]
                mcu.append((1, cb[by // 2 : by // 2 + 8, bx // 2 : bx // 2 + 8]))
                mcu.append((2, cr[by // 2 : by // 2 + 8, bx // 2 : bx // 2 + 8]))
                mcus.append(mcu)

    dc_codes = _build_codes(*_ENC_DC)
    ac_codes = _build_codes(*_ENC_AC)
    segs: list[bytes] = []
    wtr = _BitWriter()
    dc_prev = [0] * ncomp
    for n, mcu in enumerate(mcus):
        if restart_interval and n and n % restart_interval == 0:
            segs.append(wtr.flush())
            segs.append(bytes([0xFF, 0xD0 + ((n // restart_interval - 1) % 8)]))
            wtr = _BitWriter()
            dc_prev = [0] * ncomp
        for ci, block in mcu:
            dc_prev[ci] = _encode_block(
                wtr, block, qtab, dc_prev[ci], dc_codes, ac_codes
            )
    segs.append(wtr.flush())
    out += b"".join(segs)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_baseline_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to (h, w) grayscale or
    (h, w, 3) RGB uint8. Supports 4:4:4 and 4:2:0, restart intervals,
    any DHT/DQT the stream declares. Progressive / arithmetic / 12-bit
    raise NotImplementedError.

    Corruption contract (same as FLAC after ADVICE r5): every malformed
    input raises NotImplementedError, never a raw IndexError/KeyError —
    decode_media maps exactly that to ok=False."""
    try:
        return _decode_baseline(blob)
    except NotImplementedError:
        raise
    except (IndexError, ValueError, KeyError, TypeError, StopIteration,
            struct.error) as exc:
        raise NotImplementedError(
            f"corrupt baseline JPEG ({type(exc).__name__}: {exc})"
        ) from None


def _decode_baseline(blob: bytes) -> np.ndarray:
    if blob[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = None
    restart = 0
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        body = blob[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables not supported")
                tab = np.zeros(64)
                tab[_ZIGZAG] = np.frombuffer(body[j + 1 : j + 65], np.uint8)
                qtabs[tid] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                values = list(body[j + 17 : j + 17 + nv])
                codes = _build_codes(bits, values)
                huff[(cls, tid)] = {(ln_, c): s for s, (c, ln_) in codes.items()}
                j += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            for k in range(nc):
                cid, samp, qid = body[6 + 3 * k : 9 + 3 * k]
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "q": qid}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) supported, got SOF {marker & 0xF}"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for k in range(ns):
                cid, tabs = body[1 + 2 * k], body[2 + 2 * k]
                c = next(c for c in comps if c["id"] == cid)
                c["dc"], c["ac"] = tabs >> 4, tabs & 0xF
            i = i + 2 + ln
            return _decode_scan(blob, i, w, h, comps, qtabs, huff, restart)
        i += 2 + ln
    raise NotImplementedError("malformed JPEG: no SOS segment")


def _decode_scan(blob, pos, w, h, comps, qtabs, huff, restart):
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    layout = tuple((c["hs"], c["vs"]) for c in comps)
    if layout not in (((1, 1),), ((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1))):
        raise NotImplementedError(f"unsupported sampling layout {layout}")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcols = -(-w // mcu_w)
    mrows = -(-h // mcu_h)
    planes = [
        np.zeros((mrows * c["vs"] * 8, mcols * c["hs"] * 8)) for c in comps
    ]
    rdr = _BitReader(blob, pos)
    dc_prev = [0] * len(comps)
    n_mcu = 0
    for my in range(mrows):
        for mx in range(mcols):
            if restart and n_mcu and n_mcu % restart == 0:
                # everything buffered past the last MCU is byte-padding;
                # discard it so _fill surfaces the RSTn marker itself
                rdr.acc = 0
                rdr.n = 0
                rdr._fill()
                if rdr.marker is not None and 0xD0 <= rdr.marker <= 0xD7:
                    rdr.reset_at_rst()
                    dc_prev = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coef = np.zeros(64)
                        s = rdr.decode(huff[(0, c["dc"])])
                        dc_prev[ci] += _extend(rdr.bits(s), s)
                        coef[0] = dc_prev[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.decode(huff[(1, c["ac"])])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise NotImplementedError("AC index overrun")
                            coef[k] = _extend(rdr.bits(s), s)
                            k += 1
                        deq = np.zeros(64)
                        deq[_ZIGZAG] = coef
                        block = (
                            _DCT.T @ (deq.reshape(8, 8) * qtabs[c["q"]]) @ _DCT
                        ) + 128.0
                        py = (my * c["vs"] + by) * 8
                        px = (mx * c["hs"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = block
            n_mcu += 1
    if len(comps) == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    y = planes[0]
    up = []
    for ci in (1, 2):
        p = planes[ci]
        ry, rx = hmax // comps[ci]["hs"], vmax // comps[ci]["vs"]
        up.append(np.repeat(np.repeat(p, rx, axis=0), ry, axis=1))
    return _ycbcr_to_rgb(y[:h, :w], up[0][:h, :w], up[1][:h, :w])
