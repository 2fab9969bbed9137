"""Pure-stdlib/numpy baseline JPEG codec — the last real-format LoadImage gap.

The reference's LoadImage accepts JPEG bytes via PIL
(/root/reference/python/rapidocr_onnxruntime/utils.py:111-125) and its own
test fixtures ARE JPEGs (python/tests/test_files/*.jpg).  Baseline JPEG
(ITU-T T.81 SOF0) needs no codec library — markers, Huffman-coded DCT
coefficients, dequantise, 8×8 IDCT, chroma upsample, YCbCr colour space —
all implementable with numpy:

- marker parse: DQT (8/16-bit tables), SOF0/SOF1 sequential AND SOF2
  PROGRESSIVE frames, DHT (canonical Huffman), DRI (restart intervals),
  multi-SOS, APPn/COM skipped;
- entropy decode: byte-destuffed scan split at RSTn, canonical Huffman
  (BITS/HUFFVAL) decoded bit-serially, DC predictors per component, AC
  run-length with ZRL/EOB; progressive scans (T.81 §G.1.2) accumulate
  into the shared coefficient store — spectral selection bands, EOB
  runs, and successive-approximation first/refinement passes for both
  DC (arithmetic point transform) and AC (magnitude domain);
- block reconstruction: dequantise in zig-zag order, orthonormal 8×8
  IDCT as two matrix products over ALL blocks of a component at once
  (numpy batched — the hot loop is vectorised);
- chroma upsample (h/v factor duplication) and the canonical-plane
  funnel: the engine's kernel plane is grayscale, and
  gray(BT.601 of YCbCr→RGB) ≡ Y by construction, so the funnel takes the
  luma plane directly (exact, no colour round trip); grayscale JPEGs are
  already Y.

The encoder exists for fixtures/tests: baseline 4:4:4 (or given sampling
factors) with the spec's Annex-K example Huffman tables and a
caller-supplied quality; quality=100 uses all-ones quantisation tables,
making the round trip near-lossless (|error| ≤ 2 gray levels — float
DCT round-trip only, no quantisation loss), which keeps the det→cls→rec
chain's binarisation (>127) unaffected.

Malformed/unsupported data raises JpegError → LoadImageError upstream.
"""

from __future__ import annotations

import numpy as np


class JpegError(ValueError):
    """Malformed/unsupported JPEG — callers map this onto LoadImageError."""


# ---------------------------------------------------------------------------
# shared tables

ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: block = C @ coef @ C.T (IDCT), coef = C.T @ b @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_n, _k] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )

# Annex K (T.81 §K.3) example Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {(length, code): value} and {value: (code, length)}."""
    decode = {}
    encode = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            decode[(length, code)] = vals[k]
            encode[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1s like real decoders (spec: fill bits are 1)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            v = table.get((length, code))
            if v is not None:
                return v
        raise JpegError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map ``size``-bit magnitude to signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _destuff_and_split(scan: bytes):
    """Remove byte stuffing; split entropy data at RSTn markers."""
    segments = []
    cur = bytearray()
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = scan[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next marker (EOI etc.) — end of scan
            break
    segments.append(bytes(cur))
    return segments


def _find_scan_end(data: bytes, start: int) -> int:
    """Index of the first marker after ``start`` that terminates entropy
    data (not a stuffed 0xFF00, not RSTn)."""
    i = start
    n = len(data)
    while i + 1 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        return i
    return n


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 H×W grayscale (luma plane funnel).

    Baseline sequential (SOF0/SOF1) and PROGRESSIVE (SOF2: spectral
    selection + successive approximation, T.81 G.1.2) are both decoded by
    the same multi-scan engine; coefficients accumulate across scans and
    dequantise+IDCT once at the end."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise JpegError(f"jpeg decoder needs bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise JpegError("bad JPEG signature (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps, progressive); comps = [(cid, hi, vi, tq)]
    state = None  # _ScanState once SOF seen
    restart_interval = 0
    saw_scan = False
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise JpegError("truncated segment")
        seglen = (data[pos + 2] << 8) | data[pos + 3]
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise JpegError("truncated segment")
        body_start = pos + 4
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                if tbl.size != 64:
                    raise JpegError("short quantisation table")
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise JpegError("multiple frames")
            if seg[0] != 8:
                raise JpegError(f"sample precision {seg[0]} unsupported")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            if nc not in (1, 3):
                raise JpegError(f"{nc} components unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if h == 0 or w == 0:
                raise JpegError("zero dimensions")
            frame = (h, w, comps, marker == 0xC2)
            state = _ScanState(h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"SOF marker 0x{marker:02x} (lossless/arithmetic/hierarchical) unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                if len(vals) != cnt:
                    raise JpegError("short Huffman table")
                dec, _ = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cs, td_ta >> 4, td_ta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            scan_start = body_start + len(seg)
            scan_end = _find_scan_end(data, scan_start)
            state.decode_scan(
                sel, ss, se, ah, al, qt, huff_dc, huff_ac,
                restart_interval, data[scan_start:scan_end],
                progressive=frame[3],
            )
            saw_scan = True
            pos = scan_end
        # else: APPn/COM — skipped
    if frame is None or not saw_scan:
        raise JpegError("no SOS marker")
    return state.reconstruct(qt)


class _ScanState:
    """Per-frame coefficient store + multi-scan decode (T.81 §F/§G)."""

    def __init__(self, h: int, w: int, comps):
        self.h, self.w = h, w
        self.comps = comps  # [(cid, hi, vi, tq)]
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.by_id = {c[0]: c for c in comps}
        # QUANTIZED coefficients, padded MCU grid, block-raster order
        self.blocks = {
            cid: np.zeros((self.mcus_y * vi * self.mcus_x * hi, 64), dtype=np.int64)
            for cid, hi, vi, _tq in comps
        }
        self.eob_seen = {cid: False for cid, *_ in comps}

    def _own_grid(self, hi: int, vi: int) -> tuple[int, int]:
        """Non-interleaved block dims: the component's own ceil(size/8)."""
        cw = (self.w * hi + self.hmax - 1) // self.hmax
        ch = (self.h * vi + self.vmax - 1) // self.vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def decode_scan(self, sel, ss, se, ah, al, qt, huff_dc, huff_ac,
                    restart_interval, scan: bytes, progressive: bool) -> None:
        order = []
        for cs, td, ta in sel:
            if cs not in self.by_id:
                raise JpegError(f"scan selects unknown component {cs}")
            cid, hi, vi, tq = self.by_id[cs]
            if tq not in qt:
                raise JpegError(f"missing quantisation table {tq}")
            hdc = huff_dc.get(td)
            hac = huff_ac.get(ta)
            order.append((cid, hi, vi, hdc, hac))
        if not progressive:
            if ss != 0 or se != 63 or ah != 0 or al != 0:
                raise JpegError("sequential scan with spectral/SA parameters")
            self._sequential_scan(order, restart_interval, scan)
            return
        if ss == 0:
            if se != 0:
                raise JpegError("progressive DC scan must have Se=0")
            self._dc_scan(order, ah, al, restart_interval, scan)
        else:
            if len(order) != 1:
                raise JpegError("progressive AC scan must be single-component")
            self._ac_scan(order[0], ss, se, ah, al, restart_interval, scan)

    # ---- scan kinds -----------------------------------------------------

    def _units(self, order, interleaved: bool):
        """Yield (unit walk) block row-indices per unit for the scan."""
        if interleaved:
            bw = {cid: self.mcus_x * hi for cid, hi, vi, _d, _a in order}
            for mcu in range(self.mcus_x * self.mcus_y):
                my, mx = divmod(mcu, self.mcus_x)
                unit = []
                for cid, hi, vi, _d, _a in order:
                    for by in range(vi):
                        for bx in range(hi):
                            unit.append(
                                (cid, (my * vi + by) * bw[cid] + (mx * hi + bx))
                            )
                yield unit
        else:
            cid, hi, vi, _d, _a = order[0]
            bh, bw_own = self._own_grid(hi, vi)
            bw_pad = self.mcus_x * hi
            for r in range(bh):
                for c in range(bw_own):
                    yield [(cid, r * bw_pad + c)]

    def _sequential_scan(self, order, restart_interval, scan: bytes) -> None:
        interleaved = len(order) > 1
        units = list(self._units(order, interleaved))
        hdc = {cid: d for cid, _h, _v, d, _a in order}
        hac = {cid: a for cid, _h, _v, _d, a in order}
        for d in (hdc, hac):
            if any(t is None for t in d.values()):
                raise JpegError("missing Huffman table")
        segments = _destuff_and_split(scan)
        per_seg = restart_interval if restart_interval else len(units)
        u = 0
        for seg_data in segments:
            if u >= len(units):
                break
            br = _BitReader(seg_data)
            pred = {cid: 0 for cid, *_ in order}
            for _ in range(min(per_seg, len(units) - u)):
                for cid, row in units[u]:
                    coef = self.blocks[cid][row]
                    s = br.huff(hdc[cid])
                    pred[cid] += _extend(br.read(s), s)
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = br.huff(hac[cid])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC coefficient overrun")
                        coef[ZIGZAG[k]] = _extend(br.read(s), s)
                        k += 1
                u += 1
        if u < len(units):
            raise JpegError("entropy data shorter than frame")

    def _dc_scan(self, order, ah, al, restart_interval, scan: bytes) -> None:
        interleaved = len(order) > 1
        units = list(self._units(order, interleaved))
        hdc = {cid: d for cid, _h, _v, d, _a in order}
        if ah == 0 and any(t is None for t in hdc.values()):
            raise JpegError("missing Huffman table")
        segments = _destuff_and_split(scan)
        per_seg = restart_interval if restart_interval else len(units)
        u = 0
        p1 = 1 << al
        for seg_data in segments:
            if u >= len(units):
                break
            br = _BitReader(seg_data)
            pred = {cid: 0 for cid, *_ in order}
            for _ in range(min(per_seg, len(units) - u)):
                for cid, row in units[u]:
                    coef = self.blocks[cid][row]
                    if ah == 0:  # first pass: diff of arithmetic-shifted DC
                        s = br.huff(hdc[cid])
                        pred[cid] += _extend(br.read(s), s)
                        coef[0] = pred[cid] << al
                    else:  # refinement: one bit (two's-complement OR)
                        if br.read(1):
                            coef[0] = int(coef[0]) | p1
                u += 1
        if u < len(units):
            raise JpegError("entropy data shorter than frame")

    def _ac_scan(self, comp, ss, se, ah, al, restart_interval, scan: bytes) -> None:
        cid, hi, vi, _d, hac = comp
        if hac is None:
            raise JpegError("missing Huffman table")
        bh, bw_own = self._own_grid(hi, vi)
        bw_pad = self.mcus_x * hi
        rows = [r * bw_pad + c for r in range(bh) for c in range(bw_own)]
        segments = _destuff_and_split(scan)
        per_seg = restart_interval if restart_interval else len(rows)
        u = 0
        for seg_data in segments:
            if u >= len(rows):
                break
            br = _BitReader(seg_data)
            eobrun = 0
            for _ in range(min(per_seg, len(rows) - u)):
                coef = self.blocks[cid][rows[u]]
                if ah == 0:
                    eobrun = self._ac_first_block(br, hac, coef, ss, se, al, eobrun)
                else:
                    eobrun = self._ac_refine_block(br, hac, coef, ss, se, al, eobrun)
                u += 1
        if u < len(rows):
            raise JpegError("entropy data shorter than frame")

    @staticmethod
    def _ac_first_block(br, hac, coef, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = br.huff(hac)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                extra = br.read(r) if r else 0
                return (1 << r) - 1 + extra  # EOBn terminates this block
            k += r
            if k > se:
                raise JpegError("AC coefficient overrun")
            coef[ZIGZAG[k]] = _extend(br.read(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine_block(br, hac, coef, ss, se, al, eobrun) -> int:
        """T.81 G.1.2.3 successive-approximation AC refinement."""
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.huff(hac)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        break  # remaining coefs refined in the EOB branch
                    val = 0  # ZRL: skip 16 zero-history coefs
                else:
                    if s != 1:
                        raise JpegError("bad SA refinement symbol")
                    val = p1 if br.read(1) else m1
                while k <= se:
                    z = int(ZIGZAG[k])
                    if coef[z] != 0:
                        if br.read(1) and (int(coef[z]) & p1) == 0:
                            coef[z] = int(coef[z]) + (p1 if coef[z] > 0 else m1)
                    else:
                        if r == 0:
                            if val:
                                coef[z] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                z = int(ZIGZAG[k])
                if coef[z] != 0 and br.read(1) and (int(coef[z]) & p1) == 0:
                    coef[z] = int(coef[z]) + (p1 if coef[z] > 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    # ---- output ---------------------------------------------------------

    def reconstruct(self, qt) -> np.ndarray:
        planes = {}
        order = [
            (cid, hi, vi, qt[tq]) for cid, hi, vi, tq in self.comps
        ]
        h, w = self.h, self.w
        mcus_x, mcus_y = self.mcus_x, self.mcus_y
        hmax, vmax = self.hmax, self.vmax
        for cid, hi, vi, q in order:
            # blocks hold QUANTIZED coefficients in NATURAL order; the DQT
            # table arrives in zig-zag order — un-zigzag it, not the data
            q_nat = np.empty(64, dtype=np.int64)
            q_nat[ZIGZAG] = q
            coefs = (self.blocks[cid] * q_nat).astype(np.float64)
            b = coefs.reshape(-1, 8, 8)
            px = np.einsum("ij,njk,lk->nil", _C, b, _C) + 128.0
            bw, bh = mcus_x * hi, mcus_y * vi
            plane = (
                px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
            )
            # upsample to full-frame resolution then crop
            if hi != hmax or vi != vmax:
                plane = np.repeat(
                    np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
                )
            planes[cid] = plane[:h, :w]
        # canonical-plane funnel: luma IS the BT.601 gray of the decoded RGB
        y = planes[order[0][0]]
        return np.clip(np.round(y), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures/tests)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill


def _mag(v: int) -> tuple[int, int]:
    """signed value → (size, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _encode_plane_blocks(plane: np.ndarray) -> np.ndarray:
    """pixel plane (multiple of 8) → zig-zag-ordered integer DCT coefs
    (n, 64): zz[k] = round(coef_flat[ZIGZAG[k]]) (all-ones quantisation)."""
    h, w = plane.shape
    b = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ).astype(np.float64) - 128.0
    coef = np.einsum("ji,njk,kl->nil", _C, b, _C)  # C.T @ b @ C
    return np.round(coef.reshape(-1, 64))[:, ZIGZAG]


def encode_jpeg(
    img: np.ndarray,
    sampling: tuple = ((1, 1), (1, 1), (1, 1)),
    restart_interval: int = 0,
) -> bytes:
    """uint8 H×W grayscale → baseline JPEG bytes (near-lossless: all-ones
    quantisation tables, |round-trip error| ≤ 2).

    ``sampling``: per-component (h, v) factors.  Grayscale input encodes
    the luma plane; when sampling asks for subsampled chroma a neutral
    (constant 128) chroma pair is encoded at the subsampled size, which
    exercises the decoder's upsampling path while keeping gray exactness.
    Pass a single-element tuple to emit a 1-component grayscale JPEG."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg needs a 2-D uint8 image")
    h, w = img.shape
    ncomp = len(sampling)
    if ncomp not in (1, 3):
        raise ValueError("sampling must name 1 or 3 components")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    y = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    dc_dec, dc_enc = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_dec, ac_enc = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dcc_dec, dcc_enc = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    acc_dec, acc_enc = _canonical_codes(_AC_CHR_BITS, _AC_CHR_VALS)
    _ = dc_dec, ac_dec, dcc_dec, acc_dec

    # per-component planes + block tables
    comp_planes = []
    for ci, (hi, vi) in enumerate(sampling):
        if ci == 0:
            plane = y
            if (hi, vi) != (hmax, vmax):
                raise ValueError("luma must carry the max sampling factors")
        else:
            plane = np.full((ph * vi // vmax, pw * hi // hmax), 128, dtype=np.uint8)
        comp_planes.append(_encode_plane_blocks(plane))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(((len(body) + 2) >> 8, (len(body) + 2) & 0xFF))
        out.extend(body)

    ones = bytes([0x00]) + bytes([1] * 64)  # Pq=0, Tq=0, all-ones
    seg(0xDB, ones)
    if ncomp == 3:
        seg(0xDB, bytes([0x01]) + bytes([1] * 64))
    sof = bytearray([8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, ncomp])
    for ci, (hi, vi) in enumerate(sampling):
        sof.extend([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    seg(0xC0, bytes(sof))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> None:
        seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if ncomp == 3:
        dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)

    if restart_interval:
        seg(0xDD, bytes([restart_interval >> 8, restart_interval & 0xFF]))

    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos.extend([ci + 1, 0x00 if ci == 0 else 0x11])
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))

    bw_ = _BitWriter()
    mcus_x = pw // mcu_w
    mcus_y = ph // mcu_h
    pred = [0] * ncomp
    tables = [
        (dc_enc, ac_enc) if ci == 0 else (dcc_enc, acc_enc) for ci in range(ncomp)
    ]
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw_.flush()
            out.extend(bw_.out)
            bw_ = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) & 7)]))
            pred = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci, (hi, vi) in enumerate(sampling):
            denc, aenc = tables[ci]
            bw_blocks = mcus_x * hi
            for by in range(vi):
                for bx in range(hi):
                    row = (my * vi + by) * bw_blocks + (mx * hi + bx)
                    zz = comp_planes[ci][row].astype(int)
                    diff = zz[0] - pred[ci]
                    pred[ci] = zz[0]
                    size, mag = _mag(diff)
                    code, length = denc[size]
                    bw_.write(code, length)
                    bw_.write(mag, size)
                    run = 0
                    last_nz = max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
                    for k in range(1, last_nz + 1):
                        v = zz[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = aenc[0xF0]  # ZRL
                            bw_.write(code, length)
                            run -= 16
                        size, mag = _mag(int(v))
                        code, length = aenc[(run << 4) | size]
                        bw_.write(code, length)
                        bw_.write(mag, size)
                        run = 0
                    if last_nz < 63:
                        code, length = aenc[0x00]  # EOB
                        bw_.write(code, length)
    bw_.flush()
    out.extend(bw_.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixtures/tests for the SOF2 decode paths)


# complete AC table for progressive scans: the Annex-K sequential AC
# tables define only EOB0/ZRL among the s=0 symbols, but progressive AC
# coding needs the EOBn run codes (0x10..0xE0).  A canonical table with
# every symbol (255 codes at 9 bits + 1 at 10; DHT Li is a byte, so 256
# at one length is unrepresentable) keeps the stream spec-valid — real
# encoders optimise these tables per image, which changes nothing for
# the decoder under test.
_AC_ALL_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_ALL_VALS = list(range(256))


class _ProgWriter(_BitWriter):
    """BitWriter + the AC EOB-run bookkeeping of T.81 G.1.2.2."""

    def __init__(self, aenc):
        super().__init__()
        self.aenc = aenc
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.aenc[r << 4]
            self.write(code, length)
            if r:
                self.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.write(b, 1)
        self.pending_bits = []


def _prog_scan_header(out: bytearray, comps, ss, se, ah, al) -> None:
    body = bytearray([len(comps)])
    for ci, dc_t, ac_t in comps:
        body.extend([ci + 1, (dc_t << 4) | ac_t])
    body.extend([ss, se, (ah << 4) | al])
    out.extend(bytes([0xFF, 0xDA]))
    out.extend(((len(body) + 2) >> 8, (len(body) + 2) & 0xFF))
    out.extend(body)


def encode_jpeg_progressive(
    img: np.ndarray, sampling: tuple = ((1, 1),)
) -> bytes:
    """uint8 H×W grayscale → PROGRESSIVE (SOF2) JPEG bytes, using the
    libjpeg-style default scan script — DC first at Al=1, two spectral
    AC bands at Al=2, two AC successive-approximation refinements, DC
    refinement — so a decode exercises every SOF2 path (spectral
    selection, EOB runs, SA first+refine for DC and AC).  All-ones
    quantisation like encode_jpeg: the fully-refined decode must equal
    the baseline decode of the same image bit-for-bit."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive needs a 2-D uint8 image")
    h, w = img.shape
    ncomp = len(sampling)
    if ncomp not in (1, 3):
        raise ValueError("sampling must name 1 or 3 components")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    y = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    _, dc_enc = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    _, dcc_enc = _canonical_codes(_DC_CHR_BITS, _DC_CHR_VALS)
    _, ac_all = _canonical_codes(_AC_ALL_BITS, _AC_ALL_VALS)
    ac_enc = acc_enc = ac_all

    comp_blocks = []  # zig-zag (n_blocks_padded, 64) int arrays
    geoms = []  # (bw_pad, bh_own, bw_own)
    mcus_x = pw // mcu_w
    mcus_y = ph // mcu_h
    for ci, (hi, vi) in enumerate(sampling):
        if ci == 0:
            plane = y
            if (hi, vi) != (hmax, vmax):
                raise ValueError("luma must carry the max sampling factors")
        else:
            plane = np.full((ph * vi // vmax, pw * hi // hmax), 128, dtype=np.uint8)
        comp_blocks.append(_encode_plane_blocks(plane).astype(int))
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        geoms.append((mcus_x * hi, (ch + 7) // 8, (cw + 7) // 8))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(((len(body) + 2) >> 8, (len(body) + 2) & 0xFF))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    if ncomp == 3:
        seg(0xDB, bytes([0x01]) + bytes([1] * 64))
    sof = bytearray([8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, ncomp])
    for ci, (hi, vi) in enumerate(sampling):
        sof.extend([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    seg(0xC2, bytes(sof))
    for tc, th, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (1, 0, _AC_ALL_BITS, _AC_ALL_VALS),
    ):
        seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    if ncomp == 3:
        for tc, th, bits, vals in (
            (0, 1, _DC_CHR_BITS, _DC_CHR_VALS),
            (1, 1, _AC_ALL_BITS, _AC_ALL_VALS),
        ):
            seg(0xC4, bytes([(tc << 4) | th] + bits + vals))

    def dc_units():
        """interleaved MCU walk (all components) → [(ci, row), ...]."""
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            unit = []
            for ci, (hi, vi) in enumerate(sampling):
                bw_pad = geoms[ci][0]
                for by in range(vi):
                    for bx in range(hi):
                        unit.append((ci, (my * vi + by) * bw_pad + (mx * hi + bx)))
            yield unit

    def ac_rows(ci):
        bw_pad, bh_own, bw_own = geoms[ci]
        return [r * bw_pad + c for r in range(bh_own) for c in range(bw_own)]

    def dc_first(al: int) -> None:
        bw = _BitWriter()
        pred = [0] * ncomp
        for unit in dc_units():
            for ci, row in unit:
                denc = dc_enc if ci == 0 else dcc_enc
                v = comp_blocks[ci][row][0] >> al  # arithmetic point transform
                size, mag = _mag(v - pred[ci])
                pred[ci] = v
                code, length = denc[size]
                bw.write(code, length)
                if size:
                    bw.write(mag, size)
        bw.flush()
        _prog_scan_header(out, [(ci, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, 0, al)
        out.extend(bw.out)

    def dc_refine(ah: int, al: int) -> None:
        bw = _BitWriter()
        for unit in dc_units():
            for ci, row in unit:
                bw.write((comp_blocks[ci][row][0] >> al) & 1, 1)
        bw.flush()
        _prog_scan_header(out, [(ci, 0 if ci == 0 else 1, 0) for ci in range(ncomp)], 0, 0, ah, al)
        out.extend(bw.out)

    def ac_first(ci: int, ss: int, se: int, al: int) -> None:
        aenc = ac_enc if ci == 0 else acc_enc
        pw_ = _ProgWriter(aenc)
        for row in ac_rows(ci):
            zz = comp_blocks[ci][row]
            run = 0
            emitted = False
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                pw_.flush_eobrun()
                while run > 15:
                    code, length = aenc[0xF0]
                    pw_.write(code, length)
                    run -= 16
                size, mag = _mag(t if v > 0 else -t)
                code, length = aenc[(run << 4) | size]
                pw_.write(code, length)
                pw_.write(mag, size)
                run = 0
                emitted = True
            if run > 0 or not emitted:
                pw_.eobrun += 1
                if pw_.eobrun == 0x7FFF:
                    pw_.flush_eobrun()
        pw_.flush_eobrun()
        pw_.flush()
        _prog_scan_header(out, [(ci, 0, 0 if ci == 0 else 1)], ss, se, 0, al)
        out.extend(pw_.out)

    def ac_refine(ci: int, ss: int, se: int, ah: int, al: int) -> None:
        """T.81 G.1.2.2 refinement coding.  Structure mirrors the spec's
        figure G.7 discipline: a ZRL is emitted as soon as the zero-history
        run exceeds 15 at ANY nonzero-class coefficient (and only while a
        newly-significant coefficient remains, ``k <= eob`` — otherwise the
        run folds into the EOB), which guarantees every buffered correction
        bit lies inside the window its ZRL makes the decoder cross."""
        aenc = ac_enc if ci == 0 else acc_enc
        pw_ = _ProgWriter(aenc)
        for row in ac_rows(ci):
            zz = comp_blocks[ci][row]
            absv = [0] * (se + 1)
            eob = ss - 1  # index of the last newly-significant coef
            for k in range(ss, se + 1):
                t = abs(int(zz[k])) >> al
                absv[k] = t
                if t == 1:
                    eob = k
            run = 0
            br_bits: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    pw_.flush_eobrun()
                    code, length = aenc[0xF0]
                    pw_.write(code, length)
                    run -= 16
                    for b in br_bits:
                        pw_.write(b, 1)
                    br_bits = []
                if t > 1:  # history coefficient: correction bit only
                    br_bits.append(t & 1)
                    continue
                # newly significant
                pw_.flush_eobrun()
                code, length = aenc[(run << 4) | 1]
                pw_.write(code, length)
                pw_.write(1 if int(zz[k]) > 0 else 0, 1)
                for b in br_bits:
                    pw_.write(b, 1)
                br_bits = []
                run = 0
            if run > 0 or br_bits:
                pw_.eobrun += 1
                pw_.pending_bits.extend(br_bits)
                if pw_.eobrun == 0x7FFF:
                    pw_.flush_eobrun()
        pw_.flush_eobrun()
        pw_.flush()
        _prog_scan_header(out, [(ci, 0, 0 if ci == 0 else 1)], ss, se, ah, al)
        out.extend(pw_.out)

    # libjpeg-style default scan script
    dc_first(al=1)
    for ci in range(ncomp):
        ac_first(ci, 1, 5, al=2)
        ac_first(ci, 6, 63, al=2)
    for ci in range(ncomp):
        ac_refine(ci, 1, 63, ah=2, al=1)
    for ci in range(ncomp):
        ac_refine(ci, 1, 63, ah=1, al=0)
    dc_refine(ah=1, al=0)

    out.extend(b"\xff\xd9")
    return bytes(out)
