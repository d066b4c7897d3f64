"""Pure stdlib+numpy baseline JPEG codec (VERDICT r9 #9).

The write-side/read-side twin pair for the second-most-common web
image format, mirroring the PNG pair in :mod:`multimodal`
(``_decode_png`` / ``encode_png``): gives the real (``fake=False``)
multimodal decode path an in-container JPEG codec with zero native
dependencies. PIL, when installed, still takes precedence and covers
the full format zoo (progressive, arithmetic, CMYK, EXIF rotation…).

Scope — ITU-T T.81 Huffman DCT:

- decode: baseline sequential (SOF0/1) AND progressive (SOF2,
  §G.1.2: spectral selection + successive approximation — DC
  first/refine, AC band first with EOBRUN/ZRL, AC refinement
  correction bits), 8-bit, grayscale or YCbCr with any sampling
  factors (4:4:4 / 4:2:2 / 4:2:0 …), DRI/RSTn restart markers.
  Lossless/hierarchical/arithmetic coding raise the documented
  plug-point error. Progressive validated coefficient-exact: the
  JRE's progressive and baseline encodings of one image decode to
  IDENTICAL pixels (tests/fixtures/).
- encode: grayscale or RGB, baseline 4:4:4, Annex K quantization
  tables scaled by ``quality``, Annex K Huffman tables, optional
  restart markers.

Performance: the entropy decoder de-stuffs the scan in one linear
pass and resolves every Huffman symbol with a single cached
16-bit-prefix LUT index (tables cached across images — a batch
decode builds each DHT once); the DCT is one numpy matmul pair per
8×8 block. Still pure Python per symbol — a 100 TB image pipeline
plugs PIL/opencv through the ``decoder=`` seam; this codec's job is
a real, dependency-free in-container path.
"""

from __future__ import annotations

import struct

# ---- shared constants (ITU-T T.81 Annex K) ---------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural
#: row-major order after de-zigzag)
QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 Huffman specs: (bits[1..16] counts, values)
HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
     0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
     0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
     0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
     0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
     0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
     0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
     0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
     0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
     0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
     0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
     0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
     0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
     0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
     0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
     0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
     0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
     0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _dct_matrix():
    """Orthonormal 8×8 DCT-II matrix M: dct2(b) = M·b·Mᵀ, idct2(c) =
    Mᵀ·c·M."""
    import numpy as np
    k = np.arange(8)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    M *= np.sqrt(2 / 8)
    M[0] /= np.sqrt(2)
    return M


def _build_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} per T.81 C.2."""
    out, code, idx = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[idx]] = (code, ln)
            code += 1
            idx += 1
        code <<= 1
    return out


# ---- decoder ----------------------------------------------------------

#: (bits, values) → 65536-entry LUT, cached across images — standard
#: streams reuse the Annex K tables, so a batch decode builds each
#: table once, and every Huffman symbol costs ONE list index.
_LUT_CACHE: dict = {}


def _build_decode_lut(bits, values):
    """(bits, values) → flat 16-bit-prefix LUT: lut[peek16] =
    (symbol, code_length), None for invalid prefixes."""
    key = (bytes(bits), bytes(values))
    lut = _LUT_CACHE.get(key)
    if lut is not None:
        return lut
    lut = [None] * 65536
    code, idx = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            entry = (values[idx], ln)
            idx += 1
            base = code << (16 - ln)
            lut[base:base + (1 << (16 - ln))] = \
                [entry] * (1 << (16 - ln))
            code += 1
        code <<= 1
    _LUT_CACHE[key] = lut
    return lut


def _destuff_segments(buf: bytes, pos: int):
    """Entropy-coded data → (list of de-stuffed byte segments — one
    per restart interval, split at RSTn markers — and the position of
    the scan-terminating marker). One linear pass instead of per-bit
    marker checks."""
    segs, cur, n = [], bytearray(), len(buf)
    while pos < n:
        b = buf[pos]
        if b == 0xFF:
            nxt = buf[pos + 1] if pos + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                pos += 2
            else:
                break                   # scan-end marker (EOI, ...)
        else:
            cur.append(b)
            pos += 1
    segs.append(bytes(cur))
    return segs, pos


class _SegReader:
    """MSB-first bit reader over ONE de-stuffed segment. Zero-padded
    for lookahead; consuming past the real bits raises (truncated
    stream), peeking past them is fine (final-byte padding)."""

    __slots__ = ("seg", "real_bits", "bytepos", "acc", "nbits",
                 "consumed")

    def __init__(self, seg: bytes):
        self.real_bits = 8 * len(seg)
        self.seg = seg + b"\x00\x00\x00\x00"
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0
        self.consumed = 0

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        acc, nbits, bp = self.acc, self.nbits, self.bytepos
        while nbits < n:
            acc = (acc << 8) | self.seg[bp]
            bp += 1
            nbits += 8
        self.consumed += n
        if self.consumed > self.real_bits:
            raise EOFError("hit end of entropy segment")
        nbits -= n
        v = (acc >> nbits) & ((1 << n) - 1)
        # drop consumed high bits — acc stays a small int forever
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits, self.bytepos = nbits, bp
        return v

    def peek16(self) -> int:
        acc, nbits, bp = self.acc, self.nbits, self.bytepos
        while nbits < 16:
            acc = (acc << 8) | self.seg[bp]
            bp += 1
            nbits += 8
        self.acc, self.nbits, self.bytepos = acc, nbits, bp
        return (acc >> (nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.consumed += n
        if self.consumed > self.real_bits:
            raise EOFError("hit end of entropy segment")
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1


class _BitReader:
    """Reader over the scan's restart-segment list (the public
    surface the scan decoders drive: read_bits / peek16 / skip /
    sync_restart). ``end`` is the buffer position of the marker that
    terminated the scan (where header parsing resumes)."""

    def __init__(self, buf: bytes, pos: int):
        segs, self.end = _destuff_segments(buf, pos)
        self._segs = [_SegReader(s) for s in segs]
        self._i = 0
        self.cur = self._segs[0]

    def read_bits(self, n: int) -> int:
        return self.cur.read_bits(n)

    def peek16(self) -> int:
        return self.cur.peek16()

    def skip(self, n: int) -> None:
        self.cur.skip(n)

    def sync_restart(self) -> None:
        """Advance to the next restart segment (drops pad bits)."""
        self._i += 1
        if self._i >= len(self._segs):
            raise EOFError("missing restart segment")
        self.cur = self._segs[self._i]


def _decode_huff(reader: _BitReader, lut) -> int:
    entry = lut[reader.peek16()]
    if entry is None:
        raise ValueError("invalid Huffman code in JPEG stream")
    reader.skip(entry[1])
    return entry[0]


def _extend(v: int, size: int) -> int:
    """T.81 F.12 sign extension of a ``size``-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes):
    """Baseline or progressive JPEG → uint8 ndarray (H×W grayscale
    or H×W×3 RGB). Baseline (SOF0/1) decodes in one streaming scan;
    progressive (SOF2) accumulates coefficient state over every
    DC/AC first+refinement scan (T.81 §G.1.2) and reconstructs at
    EOI."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    coefs = None                        # per-comp coefficient state
    restart_interval = 0
    M = _dct_matrix()
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:              # EOI
            break
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + ln]
        if marker == 0xDB:              # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = seg[s + 1 + i]
                qt[tid] = tbl.reshape(8, 8)
                s += 65
        elif marker == 0xC4:            # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                values = list(seg[s + 17:s + 17 + n])
                huff[(cls, tid)] = _build_decode_lut(bits, values)
                s += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, 2 prog
            depth = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            if depth != 8:
                raise NotImplementedError("only 8-bit JPEG")
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding (SOF{marker - 0xC0}) — "
                f"install PIL or pass decoder=")
        elif marker == 0xDD:            # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:            # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []                   # (comp_idx, dc_tid, ac_tid)
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(frame[2])
                          if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 0xF))
            data_pos = pos + ln
            if not progressive:
                return _decode_scan(payload, data_pos, frame, scan,
                                    qt, huff, restart_interval, M, np)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_coefs(frame, np)
            reader = _BitReader(payload, data_pos)
            _decode_prog_scan(reader, frame, scan, coefs, huff,
                              restart_interval, ss, se,
                              ahal >> 4, ahal & 0xF)
            pos = reader.end
            continue
        pos += ln
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt, M, np)
    raise ValueError("no SOS marker in JPEG")


def _grid(frame):
    """((mcux, mcuy), per-comp padded block grid (bh, bw), per-comp
    REAL block grid for non-interleaved scans (T.81 A.2.2:
    ceil(ceil(dim·sampling/max)/8), unpadded))."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [(mcuy * vs, mcux * hs) for _, hs, vs, _ in comps]

    def blocks(dim, samp, smax):
        comp = -(-dim * samp // smax)   # ceil(dim·samp/smax)
        return -(-comp // 8)

    real = [(blocks(h, vs, vmax), blocks(w, hs, hmax))
            for _, hs, vs, _ in comps]
    return (mcux, mcuy), padded, real


def _alloc_coefs(frame, np):
    _, padded, _ = _grid(frame)
    return [np.zeros((bh, bw, 64), dtype=np.int32)
            for bh, bw in padded]


def _decode_prog_scan(reader, frame, scan, coefs, huff,
                      restart_interval, ss, se, ah, al):
    """One progressive scan (T.81 §G.1.2): DC first/refine
    (interleaved or single), AC first/refine (single component,
    spectral band [ss, se], successive approximation ah→al)."""
    h, w, comps = frame
    (mcux, mcuy), _, real = _grid(frame)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC")
        _prog_dc_scan(reader, frame, scan, coefs, huff,
                      restart_interval, ah, al, mcux, mcuy, real)
        return
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-comp")
    ci, _, ac_tid = scan[0]
    hb, wb = real[ci]
    coef = coefs[ci]
    act = huff[(1, ac_tid)]
    if ah == 0:
        _prog_ac_first(reader, coef, act, restart_interval,
                       ss, se, al, hb, wb)
    else:
        _prog_ac_refine(reader, coef, act, restart_interval,
                        ss, se, al, hb, wb)


def _prog_dc_scan(reader, frame, scan, coefs, huff,
                  restart_interval, ah, al, mcux, mcuy, real):
    comps = frame[2]
    preds = [0] * len(comps)
    nmcu = 0
    if len(scan) == 1:
        # non-interleaved: walk the component's REAL block grid
        # (T.81 A.2.2 — NOT the MCU-padded grid)
        ci, dc_tid, _ = scan[0]
        hb, wb = real[ci]
        units = [(my, mx) for my in range(hb) for mx in range(wb)]
        per_mcu = [(ci, dc_tid, 1, 1)]
    else:
        units = [(my, mx) for my in range(mcuy)
                 for mx in range(mcux)]
        per_mcu = [(ci, dc_tid, comps[ci][1], comps[ci][2])
                   for ci, dc_tid, _ in scan]
    for my, mx in units:
        if restart_interval and nmcu \
                and nmcu % restart_interval == 0:
            reader.sync_restart()
            preds = [0] * len(comps)
        nmcu += 1
        for ci, dc_tid, hs, vs in per_mcu:
            coef = coefs[ci]
            for by in range(vs):
                for bx in range(hs):
                    y = my * vs + by
                    x = mx * hs + bx
                    if ah == 0:
                        dct = huff[(0, dc_tid)]
                        size = _decode_huff(reader, dct)
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        coef[y, x, 0] = preds[ci] << al
                    else:
                        coef[y, x, 0] |= reader.read_bits(1) << al


def _prog_ac_first(reader, coef, act, restart_interval,
                   ss, se, al, hb, wb):
    eobrun = 0
    nblk = 0
    for y in range(hb):
        for x in range(wb):
            if restart_interval and nblk \
                    and nblk % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            nblk += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            blk = coef[y, x]
            k = ss
            while k <= se:
                rs = _decode_huff(reader, act)
                r, s = rs >> 4, rs & 15
                if s:
                    k += r
                    if k > se:
                        raise ValueError("AC run past band")
                    blk[ZIGZAG[k]] = _extend(
                        reader.read_bits(s), s) << al
                    k += 1
                else:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += 16             # ZRL


def _prog_ac_refine(reader, coef, act, restart_interval,
                    ss, se, al, hb, wb):
    p1 = 1 << al
    m1 = -1 << al
    zz = ZIGZAG
    eobrun = 0
    nblk = 0
    rd1 = reader.read_bits
    for y in range(hb):
        for x in range(wb):
            if restart_interval and nblk \
                    and nblk % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            nblk += 1
            blk = coef[y, x]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(reader, act)
                    r, s = rs >> 4, rs & 15
                    if s:
                        s_val = p1 if rd1(1) else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd1(r)
                        break
                    # advance r zero-history coeffs, correcting
                    # every nonzero one passed over
                    while k <= se:
                        c = blk[zz[k]]
                        if c != 0:
                            if rd1(1) and (c & p1) == 0:
                                blk[zz[k]] = c + (p1 if c >= 0
                                                  else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s:
                        blk[zz[k]] = s_val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    c = blk[zz[k]]
                    if c != 0 and rd1(1) and (c & p1) == 0:
                        blk[zz[k]] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(frame, coefs, qt, M, np):
    """Dequantize + vectorized IDCT of the accumulated coefficient
    state, then the shared upsample/crop/color tail."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, hs, vs, tq), coef in zip(comps, coefs):
        bh, bw, _ = coef.shape
        q = qt[tq].reshape(-1)
        c = coef.reshape(bh * bw, 64).astype(np.float64) * q
        blocks = c.reshape(bh * bw, 8, 8)
        px = M.T @ blocks @ M + 128.0
        plane = (px.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        planes.append(plane)
    return _finish_planes(planes, frame, hmax, vmax, np)


def _decode_scan(buf, pos, frame, scan, qt, huff, restart_interval,
                 M, np):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8),
                       dtype=np.float64) for c in comps]
    reader = _BitReader(buf, pos)
    preds = [0] * len(comps)
    Mt = M.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(comps)
            for ci, dc_tid, ac_tid in scan:
                _, hs, vs, tq = comps[ci]
                dct, act = huff[(0, dc_tid)], huff[(1, ac_tid)]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        blk = np.zeros(64, dtype=np.float64)
                        size = _decode_huff(reader, dct)
                        diff = _extend(reader.read_bits(size), size)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:   # ZRL
                                    k += 16
                                    continue
                                break           # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block")
                            blk[ZIGZAG[k]] = _extend(
                                reader.read_bits(size), size)
                            k += 1
                        coef = blk.reshape(8, 8) * q
                        px = Mt @ coef @ M + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    return _finish_planes(planes, frame, hmax, vmax, np)


def _finish_planes(planes, frame, hmax, vmax, np):
    """Shared decode tail: chroma upsample, crop, YCbCr→RGB."""
    h, w, comps = frame
    out = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(out[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ---- encoder ----------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)

    def marker(self, code: int) -> None:
        """Emit a raw (unstuffed) marker at a byte boundary."""
        self.align()
        self.out += bytes([0xFF, code])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _quality_scale(table, quality: int):
    import numpy as np
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.array([(v * scale + 50) // 100 for v in table])
    return np.clip(t, 1, 255).astype(np.float64)


def _encode_block(bw, blk, q, dc_codes, ac_codes, pred, M, np):
    coef = (M @ (blk - 128.0) @ M.T) / q
    # gather natural-order coefficients into zigzag stream order
    zz = np.rint(coef.reshape(-1)[ZIGZAG]).astype(np.int64)
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(v & ((1 << size) - 1), size)
    # AC
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        mag = v if v > 0 else v + (1 << size) - 1
        bw.write(mag & ((1 << size) - 1), size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]       # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(pixels, quality: int = 85,
                restart_interval: int = 0) -> bytes:
    """uint8 H×W (grayscale) or H×W×3 (RGB) → baseline JPEG bytes,
    4:4:4 sampling, Annex K tables scaled by ``quality``.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs (DC predictors reset, bitstream byte-aligned) — the
    T.81 mechanism that makes the entropy stream segment-parallel
    decodable, which is how a real 100 TB image pipeline splits one
    large JPEG across workers without decoding it serially."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 3 and px.shape[2] == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    elif px.ndim == 2:
        planes = [px]
    else:
        raise ValueError("pixels must be H×W or H×W×3")
    h, w = px.shape[:2]
    ncomp = len(planes)
    qlum = _quality_scale(QUANT_LUM, quality).reshape(8, 8)
    qchrom = _quality_scale(QUANT_CHROM, quality).reshape(8, 8)
    M = _dct_matrix()
    dc_l = _build_codes(*HUFF_DC_LUM)
    ac_l = _build_codes(*HUFF_AC_LUM)
    dc_c = _build_codes(*HUFF_DC_CHROM)
    ac_c = _build_codes(*HUFF_AC_CHROM)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tid, q in ((0, qlum),) + (((1, qchrom),) if ncomp > 1 else ()):
        zz = bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
        out += seg(0xDB, bytes([tid]) + zz)
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += seg(0xC0, bytes(sof))
    for cls, tid, (bits, values) in (
            (0, 0, HUFF_DC_LUM), (1, 0, HUFF_AC_LUM),
            *(((0, 1, HUFF_DC_CHROM), (1, 1, HUFF_AC_CHROM))
              if ncomp > 1 else ())):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(values))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    # pad planes to 8 via edge replication, scan MCU-major (4:4:4 →
    # one block per component per MCU)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
              for p in planes]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            if restart_interval and mcu \
                    and mcu % restart_interval == 0:
                bw.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                preds = [0] * ncomp
            mcu += 1
            for ci, plane in enumerate(padded):
                q = qlum if ci == 0 else qchrom
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                preds[ci] = _encode_block(
                    bw, plane[y0:y0 + 8, x0:x0 + 8], q, dc, ac,
                    preds[ci], M, np)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
