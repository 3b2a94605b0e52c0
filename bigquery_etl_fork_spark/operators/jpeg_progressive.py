"""Progressive JPEG (ITU-T T.81 Annex G, huffman mode) codec in pure numpy.

Extends the baseline codec (``jpeg.py``) to SOF2 progressive streams,
closing the second of the two entropy-coded image gates without Pillow:

- **Decoder**: full spectral-selection + successive-approximation
  progression — interleaved/non-interleaved DC first scans, DC refinement
  bits, per-component AC band scans with EOB-run coding (G.1.2.2), AC
  refinement scans with correction bits (G.1.2.3), restart intervals in
  any scan, DHT/DQT segments between scans, and truncated-stream decode
  (the point of progressive: any scan prefix yields a coarse image).
- **Encoder**: a matching fixture encoder emitting a libjpeg-style scan
  script (DC first at Al=1 → AC bands 1-5 / 6-63 at Al=1 → DC refinement
  → AC refinements per band), so every decoder path above is exercised
  by round-trips. Compression ratio is irrelevant for fixtures; the
  huffman tables are the baseline encoder's fixed canonical sets,
  declared in DHT and read back generically.

Ground truth without an external codec: the progressive wire format is
pure entropy-layout — the quantized coefficient domain is IDENTICAL to
baseline. Tests therefore assert ``decode(encode_progressive(px)) ==
decode_baseline(encode_baseline(px))`` pixel-EXACT for the same quant
table: the two pipelines share only the DCT/quant kernel and diverge at
the entropy layer, so an entropy bug on either side breaks equality.

Reference behavioral spec: the reference repo ships no media plane; this
exists for SURVEY §2's multimodal-column operators (decode over binary
columns — the Spark kernel is the Arrow-batched mapInPandas UDF in
multimodal.py). Corruption contract: every malformed-input path raises
NotImplementedError, which decode_media maps to ok=False.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    _DCT,
    _ENC_AC,
    _ENC_DC,
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_codes,
    _category,
    _extend,
    _pad_to,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
)

__all__ = ["encode_progressive_jpeg", "decode_progressive_jpeg"]


# ---------------------------------------------------------------------------
# shared coefficient-domain helpers


def _plane_coefs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients for every 8x8 block of a (padded)
    plane: (blocks_v, blocks_h, 64) int32."""
    h, w = plane.shape
    bv, bh = h // 8, w // 8
    out = np.zeros((bv, bh, 64), np.int32)
    for by in range(bv):
        for bx in range(bh):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _DCT @ (blk.astype(np.float64) - 128.0) @ _DCT.T
            out[by, bx] = np.round(coef / qtab).astype(np.int32).ravel()[_ZIGZAG]
    return out


def _comp_planes(arr: np.ndarray, subsampling: str) -> tuple[list, list]:
    """(planes, sampling factors) exactly as the baseline encoder builds
    them, so the coefficient domain matches baseline bit-for-bit."""
    if arr.ndim == 2:
        return [_pad_to(arr, 8).astype(np.float64)], [(1, 1)]
    ycc = _rgb_to_ycbcr(arr)
    mult = 16 if subsampling == "420" else 8
    y = _pad_to(ycc[..., 0], mult)
    cb = _pad_to(ycc[..., 1], mult)
    cr = _pad_to(ycc[..., 2], mult)
    if subsampling == "420":
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        return [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
    return [y, cb, cr], [(1, 1), (1, 1), (1, 1)]


# ---------------------------------------------------------------------------
# encoder


class _ScanWriter:
    """One scan's entropy stream: bit writer + cross-block EOB-run state
    (G.1.2.2: the EOB run symbol (nbits<<4) ends 2^nbits..2^(nbits+1)-1
    consecutive all-zero bands; refinement runs additionally carry the
    buffered correction bits of already-nonzero coefficients)."""

    def __init__(self, ac_codes, restart_interval: int):
        self.ac = ac_codes
        self.ri = restart_interval
        self.w = _BitWriter()
        self.segs: list[bytes] = []
        self.eobrun = 0
        self.pending_bits: list[int] = []  # corrections owed after the run
        self.unit = 0  # MCUs (interleaved) or blocks (non-interleaved)
        self.rst = 0

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            c, ln = self.ac[nbits << 4]
            self.w.put(c, ln)
            if nbits:
                self.w.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pending_bits:
            self.w.put(b, 1)
        self.pending_bits = []

    def unit_boundary(self) -> bool:
        """Called before each MCU/block: emit RSTn on interval boundaries.
        Returns True when a restart was emitted (callers reset predictors)."""
        fired = False
        if self.ri and self.unit and self.unit % self.ri == 0:
            self.flush_eobrun()
            self.segs.append(self.w.flush())
            self.segs.append(bytes([0xFF, 0xD0 + ((self.unit // self.ri - 1) % 8)]))
            self.w = _BitWriter()
            self.rst += 1
            fired = True
        self.unit += 1
        return fired

    def done(self) -> bytes:
        self.flush_eobrun()
        self.segs.append(self.w.flush())
        return b"".join(self.segs)


def _write_dc_first(sw, coefs, order, dc_codes, al) -> None:
    """Interleaved (or single-component) DC scan: diffs of dc >> al."""
    prev = [0] * len(coefs)
    for mcu in order:
        if sw.unit_boundary():
            prev = [0] * len(coefs)  # predictors reset at restart
        for ci, by, bx in mcu:
            dc = int(coefs[ci][by, bx, 0]) >> al  # arithmetic shift (T.81 G.1.2.1)
            diff = dc - prev[ci]
            prev[ci] = dc
            s = _category(diff)
            c, ln = dc_codes[s]
            sw.w.put(c, ln)
            if s:
                sw.w.put(diff if diff > 0 else diff + (1 << s) - 1, s)


def _write_dc_refine(sw, coefs, order, al) -> None:
    for mcu in order:
        sw.unit_boundary()
        for ci, by, bx in mcu:
            sw.w.put((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)


def _write_ac_first(sw, cf, blocks, ss, se, al) -> None:
    """Non-interleaved AC band scan, magnitudes point-transformed by
    |v| >> al (truncation toward zero), zero bands folded into EOB runs."""
    for by, bx in blocks:
        sw.unit_boundary()
        band = cf[by, bx, ss : se + 1]
        vals = [(int(abs(v)) >> al) * (1 if v > 0 else -1) for v in band]
        nz = [i for i, v in enumerate(vals) if v != 0]
        if not nz:
            sw.eobrun += 1
            if sw.eobrun == 0x7FFF:
                sw.flush_eobrun()
            continue
        sw.flush_eobrun()
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = sw.ac[0xF0]  # ZRL
                sw.w.put(c, ln)
                run -= 16
            s = _category(v)
            c, ln = sw.ac[(run << 4) | s]
            sw.w.put(c, ln)
            sw.w.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if nz[-1] < se - ss:
            sw.eobrun += 1
            if sw.eobrun == 0x7FFF:
                sw.flush_eobrun()


def _write_ac_refine(sw, cf, blocks, ss, se, al) -> None:
    """AC successive-approximation refinement (G.1.2.3, the libjpeg
    encode_mcu_AC_refine structure): newly-significant coefficients
    (|v|>>al == 1) emit (run<<4|1)+sign; already-nonzero history emits
    one correction bit, buffered behind the pending ZRL/EOB symbol."""
    for by, bx in blocks:
        sw.unit_boundary()
        band = cf[by, bx, ss : se + 1]
        absv = [int(abs(v)) >> al for v in band]
        eob = 0  # index AFTER the last newly-significant coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eob = i + 1
        run = 0
        br: list[int] = []  # correction bits owed to the next symbol
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            # ZRLs must flush BEFORE any nonzero coefficient — history
            # included — or correction bits buffered across a >16-zero
            # gap would land after the wrong symbol and desync the
            # decoder's positional walk (caught by the randomized
            # coefficient-level round-trip test); never past the last
            # newly-significant coefficient (those zeros fold into EOB)
            while run > 15 and i < eob:
                sw.flush_eobrun()
                c, ln = sw.ac[0xF0]
                sw.w.put(c, ln)
                run -= 16
                for b in br:
                    sw.w.put(b, 1)
                br = []
            if a > 1:  # history coefficient: one correction bit
                br.append(a & 1)
                continue
            # newly significant (a == 1)
            sw.flush_eobrun()
            c, ln = sw.ac[(run << 4) | 1]
            sw.w.put(c, ln)
            sw.w.put(1 if band[i] > 0 else 0, 1)
            for b in br:
                sw.w.put(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            # zeros and/or corrections trail the last newly-significant
            # coefficient: fold them into a (possibly cross-block) EOB run
            sw.eobrun += 1
            sw.pending_bits.extend(br)
            if sw.eobrun == 0x7FFF or len(sw.pending_bits) > 900:
                sw.flush_eobrun()


def _default_script(ncomp: int) -> list[tuple]:
    """(comps, Ss, Se, Ah, Al) per scan — the spectral-selection +
    successive-approximation shape real encoders emit."""
    comps_all = list(range(ncomp))
    script: list[tuple] = [(comps_all, 0, 0, 0, 1)]  # DC first, Al=1
    for ci in range(ncomp):
        script.append(([ci], 1, 5, 0, 1))
    for ci in range(ncomp):
        script.append(([ci], 6, 63, 0, 1))
    script.append((comps_all, 0, 0, 1, 0))  # DC refinement
    for ci in range(ncomp):
        script.append(([ci], 1, 5, 1, 0))
    for ci in range(ncomp):
        script.append(([ci], 6, 63, 1, 0))
    return script


def encode_progressive_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | int | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
    scan_script: list[tuple] | None = None,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    progressive (SOF2) JPEG. Same coefficient pipeline as
    ``encode_baseline_jpeg`` (identical quant/subsampling semantics) —
    only the entropy layout differs. ``restart_interval`` applies to
    every scan (MCUs for interleaved DC scans, blocks otherwise)."""
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
    planes, samp = _comp_planes(arr, subsampling)
    ncomp = len(planes)
    coefs = [_plane_coefs(p, qtab) for p in planes]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mrows = -(-h // (8 * vmax))
    mcols = -(-w // (8 * hmax))

    script = scan_script if scan_script is not None else _default_script(ncomp)

    out = bytearray(b"\xff\xd8")
    zz_q = qtab.ravel()[_ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(zz_q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for cls, (bits, values) in ((0, _ENC_DC), (1, _ENC_AC)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_codes = _build_codes(*_ENC_DC)
    ac_codes = _build_codes(*_ENC_AC)

    for comp_ids, ss, se, ah, al in script:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += struct.pack(">BB", ci + 1, 0x00)
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        sw = _ScanWriter(ac_codes, restart_interval)
        if ss == 0:  # DC scan: interleaved MCU order over ALL named comps
            order = []
            for my in range(mrows):
                for mx in range(mcols):
                    mcu = []
                    for ci in comp_ids:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                mcu.append((ci, my * vs + by, mx * hs + bx))
                    order.append(mcu)
            if ah == 0:
                _write_dc_first(sw, coefs, order, dc_codes, al)
            else:
                _write_dc_refine(sw, coefs, order, al)
        else:  # AC scan: exactly one component, natural block raster
            (ci,) = comp_ids
            hs, vs = samp[ci]
            cw = -(-w * hs // hmax)
            ch = -(-h * vs // vmax)
            blocks = [
                (by, bx) for by in range(-(-ch // 8)) for bx in range(-(-cw // 8))
            ]
            if ah == 0:
                _write_ac_first(sw, coefs[ci], blocks, ss, se, al)
            else:
                _write_ac_refine(sw, coefs[ci], blocks, ss, se, al)
        out += sw.done()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def _decode_dc_scan(rdr, coefs, order, huff, comps, scan_comps, ah, al, restart):
    prev = {ci: 0 for ci in scan_comps}
    for n, mcu in enumerate(order):
        if restart and n and n % restart == 0:
            rdr.acc = 0
            rdr.n = 0
            rdr._fill()
            if rdr.marker is not None and 0xD0 <= rdr.marker <= 0xD7:
                rdr.reset_at_rst()
                prev = {ci: 0 for ci in scan_comps}
        for ci, by, bx in mcu:
            if ah == 0:
                s = rdr.decode(huff[(0, comps[ci]["dc"])])
                if s > 11:
                    raise NotImplementedError("invalid DC category")
                prev[ci] += _extend(rdr.bits(s), s)
                coefs[ci][by, bx, 0] = prev[ci] << al
            else:
                if rdr.bits(1):
                    coefs[ci][by, bx, 0] |= 1 << al


def _decode_ac_first_block(rdr, band, actab, ss, se, al) -> int:
    """Returns the EOB run STARTED by this block (0 if none)."""
    from .jpeg import _extend

    k = ss
    while k <= se:
        rs = rdr.decode(actab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            eob = 1 << r
            if r:
                eob += rdr.bits(r)
            return eob - 1  # this block is the run's first member
        k += r
        if k > se:
            raise NotImplementedError("AC index overrun in progressive scan")
        band[k - ss] = _extend(rdr.bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine_block(rdr, band, actab, ss, se, al, eobrun) -> int:
    """G.1.2.3 refinement for one block; returns the updated EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode(actab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.bits(r)
                    break
                # r == 15: ZRL — advance past 16 zero-history positions
            else:
                if s != 1:
                    raise NotImplementedError(
                        "invalid refinement magnitude in progressive scan"
                    )
                val = p1 if rdr.bits(1) else -p1
            while k <= se:
                c = int(band[k - ss])
                if c != 0:
                    if rdr.bits(1) and (abs(c) & p1) == 0:
                        band[k - ss] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                band[k - ss] = val
            elif val:
                raise NotImplementedError("refinement position overrun")
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(band[k - ss])
            if c != 0:
                if rdr.bits(1) and (abs(c) & p1) == 0:
                    band[k - ss] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_ac_scan(rdr, cf, blocks, actab, ss, se, ah, al, restart):
    eobrun = 0
    for n, (by, bx) in enumerate(blocks):
        if restart and n and n % restart == 0:
            rdr.acc = 0
            rdr.n = 0
            rdr._fill()
            if rdr.marker is not None and 0xD0 <= rdr.marker <= 0xD7:
                rdr.reset_at_rst()
                eobrun = 0
        band = cf[by, bx, ss : se + 1]
        if ah == 0:
            if eobrun > 0:
                eobrun -= 1
            else:
                eobrun = _decode_ac_first_block(rdr, band, actab, ss, se, al)
        else:
            eobrun = _decode_ac_refine_block(rdr, band, actab, ss, se, al, eobrun)
        cf[by, bx, ss : se + 1] = band


def decode_progressive_jpeg(blob: bytes, allow_truncated: bool = False):
    """Decode a progressive (SOF2, huffman) JPEG to (h, w) grayscale or
    (h, w, 3) RGB uint8. Supports 4:4:4 / 4:2:0, any spectral-selection /
    successive-approximation scan script, restart intervals, DHT/DQT
    between scans. ``allow_truncated=True`` reconstructs from whatever
    scans are present (the progressive preview property); otherwise a
    stream that ends before EOI raises NotImplementedError.

    Corruption contract (same as FLAC after ADVICE r5): every malformed
    input raises NotImplementedError — decode_media's batch kernel maps
    exactly that to ok=False, so one bad blob can never crash a batch."""
    try:
        return _decode_progressive(blob, allow_truncated)
    except NotImplementedError:
        raise
    except (IndexError, ValueError, KeyError, TypeError, StopIteration,
            struct.error) as exc:
        raise NotImplementedError(
            f"corrupt progressive JPEG ({type(exc).__name__}: {exc})"
        ) from None


def _decode_progressive(blob: bytes, allow_truncated: bool):
    if blob[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    coefs: list[np.ndarray] = []
    h = w = None
    hmax = vmax = mrows = mcols = 0
    restart = 0
    saw_eoi = False
    saw_scan = False
    i = 2
    while i + 2 <= len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            saw_eoi = True
            break
        if i + 4 > len(blob):
            break
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        body = blob[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables not supported")
                tab = np.zeros(64)
                tab[_ZIGZAG] = np.frombuffer(body[j + 1 : j + 65], np.uint8)
                qtabs[tid] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                values = list(body[j + 17 : j + 17 + nv])
                codes = _build_codes(bits, values)
                huff[(cls, tid)] = {(ln_, c): s for s, (c, ln_) in codes.items()}
                j += 17 + nv
        elif marker == 0xC2:  # SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            for k in range(nc):
                cid, samp, qid = body[6 + 3 * k : 9 + 3 * k]
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "q": qid,
                     "dc": 0, "ac": 0}
                )
            layout = tuple((c["hs"], c["vs"]) for c in comps)
            if layout not in (
                ((1, 1),),
                ((1, 1), (1, 1), (1, 1)),
                ((2, 2), (1, 1), (1, 1)),
            ):
                raise NotImplementedError(f"unsupported sampling layout {layout}")
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mrows = -(-h // (8 * vmax))
            mcols = -(-w // (8 * hmax))
            coefs = [
                np.zeros((mrows * c["vs"], mcols * c["hs"], 64), np.int32)
                for c in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "decode_progressive_jpeg handles SOF2 only; use decode_jpeg"
            )
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if not comps:
                raise NotImplementedError("SOS before SOF2")
            ns = body[0]
            scan_comps = []
            for k in range(ns):
                cid, tabs = body[1 + 2 * k], body[2 + 2 * k]
                ci = next(
                    idx for idx, c in enumerate(comps) if c["id"] == cid
                )
                comps[ci]["dc"], comps[ci]["ac"] = tabs >> 4, tabs & 0xF
                scan_comps.append(ci)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if se > 63 or ss > se:
                raise NotImplementedError("invalid spectral band in SOS")
            if ss > 0 and ns != 1:
                raise NotImplementedError(
                    "progressive AC scans must be single-component"
                )
            rdr = _BitReader(blob, i + 2 + ln)
            try:
                if ss == 0:
                    if se != 0:
                        raise NotImplementedError("DC scan with Se != 0")
                    order = []
                    for my in range(mrows):
                        for mx in range(mcols):
                            mcu = []
                            for ci in scan_comps:
                                c = comps[ci]
                                for by in range(c["vs"]):
                                    for bx in range(c["hs"]):
                                        mcu.append(
                                            (ci, my * c["vs"] + by,
                                             mx * c["hs"] + bx)
                                        )
                            order.append(mcu)
                    _decode_dc_scan(
                        rdr, coefs, order, huff, comps, scan_comps, ah, al,
                        restart,
                    )
                else:
                    ci = scan_comps[0]
                    c = comps[ci]
                    cw = -(-w * c["hs"] // hmax)
                    ch = -(-h * c["vs"] // vmax)
                    blocks = [
                        (by, bx)
                        for by in range(-(-ch // 8))
                        for bx in range(-(-cw // 8))
                    ]
                    actab = huff.get((1, c["ac"]))
                    if ah == 0 and actab is None:
                        raise NotImplementedError("missing AC huffman table")
                    _decode_ac_scan(
                        rdr, coefs[ci], blocks, actab, ss, se, ah, al, restart
                    )
            except (IndexError, struct.error) as exc:
                raise NotImplementedError(
                    f"truncated progressive scan data: {exc}"
                ) from None
            saw_scan = True
            # resume the segment walk AFTER the entropy data: skip forward
            # to the next true marker, treating 0xFF00 as stuffing and
            # RSTn as in-scan (the naive walk would misparse a stuffed
            # 0xFF00 tail as a zero-length segment)
            j = rdr.pos
            while j + 1 < len(blob):
                if (
                    blob[j] == 0xFF
                    and blob[j + 1] != 0x00
                    and not (0xD0 <= blob[j + 1] <= 0xD7)
                ):
                    break
                j += 1
            i = j
            continue
        i += 2 + ln
    if not saw_scan or h is None:
        raise NotImplementedError("malformed progressive JPEG: no decodable scan")
    if not saw_eoi and not allow_truncated:
        raise NotImplementedError(
            "truncated progressive stream (no EOI); pass allow_truncated=True "
            "for a partial-scan preview decode"
        )
    return _reconstruct(coefs, comps, qtabs, w, h, hmax, vmax)


def _reconstruct(coefs, comps, qtabs, w, h, hmax, vmax):
    planes = []
    for ci, c in enumerate(comps):
        cf = coefs[ci]
        bv, bh_ = cf.shape[:2]
        plane = np.zeros((bv * 8, bh_ * 8))
        q = qtabs.get(c["q"])
        if q is None:
            raise NotImplementedError("missing quant table")
        for by in range(bv):
            for bx in range(bh_):
                deq = np.zeros(64)
                deq[_ZIGZAG] = cf[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ (deq.reshape(8, 8) * q) @ _DCT
                ) + 128.0
        planes.append(plane)
    if len(comps) == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    y = planes[0]
    up = []
    for ci in (1, 2):
        p = planes[ci]
        ry = vmax // comps[ci]["vs"]
        rx = hmax // comps[ci]["hs"]
        up.append(np.repeat(np.repeat(p, ry, axis=0), rx, axis=1))
    return _ycbcr_to_rgb(y[:h, :w], up[0][:h, :w], up[1][:h, :w])
