"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec).

``parse_jpeg`` decodes baseline (SOF0/1) AND progressive (SOF2)
DCT JPEGs with numpy + stdlib only: marker walk (DQT 8/16-bit, DHT —
including per-scan overrides, DRI restart intervals, APPn/COM
skipped), Huffman entropy decode with 0xFF00 unstuffing and RSTn
predictor/EOB-run resets, and for progressive streams the full
multi-scan coefficient accumulation of T.81 Annex G: spectral
selection, successive approximation (DC and AC, first and refinement
passes with EOB-run correction bits), non-interleaved true-block-grid
walks for single-component scans. Reconstruction (dequant, zigzag,
separable matrix IDCT, 1-2x sampling-factor upsampling, BT.601
conversion) runs once at EOI. Hierarchical, arithmetic-coded and
12-bit streams are rejected with a clear ``ValueError`` — the
multimodal stages' per-row err channel, same discipline as the PNG
codec. Every malformed-input path raises ValueError (never
struct/zlib/Huffman internals), and the pixel cap bounds allocation
for untrusted web bytes.

``encode_jpeg`` is the test/oracle harness: baseline grayscale or
color at 4:4:4 / 4:2:2 / 4:2:0 with a caller-chosen quantization
table and optional restart intervals. Its FDCT is the O(N^4)
definition sum straight from the spec — deliberately NOT the
decoder's matrix IDCT — so a transform bug cannot cancel in
roundtrip tests; flat blocks with a divisor-friendly quant table
quantize losslessly, which is what makes exact closed-form oracles
possible (q_jpeg_real).

Performance note (r8): entropy decode is a per-SYMBOL Python loop —
a 2^16 Huffman LUT over 16-bit peeks of a destuffed segment, with the
baseline hot path fully inlined (``_scan_blocks_baseline_fast``).
That is ~3x the previous per-bit tree walk on entropy-dense streams
and leaves realistic (sparse-AC) megapixel photos bound by the numpy
reconstruction (~0.35s/MP), with worst-case noise streams at
~1.5-2.5s/MP — the remaining floor is ~15 Python bytecodes per
coefficient, which only a C extension would remove. The distributed
decode path amortizes this across executor cores (one image per row;
see bench q_codec_decode / q_codec_decode_mp), which is the real
throughput lever for a crawl corpus of many small-to-mid images.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAX_PIXELS = 1 << 26          # cheap first gate (pixel count)
# Byte budget on ESTIMATED PEAK allocation, checked at SOF before any
# array is created. The pixel cap alone is not enough here: unlike
# PNG's uint8 planes, the coefficient store costs 8 bytes per pixel
# per component (int64) and reconstruction adds float64 copies of the
# same size, so a ~100-byte hostile stream declaring 8192x8192x3 would
# allocate ~1.6 GB at SOF and peak near 5 GB at EOI — a MemoryError
# that escapes the per-row err channel and can OOM executors running
# parallel decode tasks. Estimated peak = 3x the coefficient bytes
# (coef int64 + float64 IDCT copy + upsampled/clipped planes).
JPEG_MAX_ALLOC_BYTES = 1 << 28     # 256 MiB peak, same order as PNG's

# zigzag order: scan index -> (row, col)
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# T.81 Annex K typical Huffman tables (spec constants)
_DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHR_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHR_VALS = list(range(12))
_AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHR_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# IDCT basis: block = C.T @ coef @ C, C[u,x] = c(u) cos((2x+1)uπ/16)/2
_IDCT_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _IDCT_C[_u, _x] = 0.5 * _cu * np.cos(
            (2 * _x + 1) * _u * np.pi / 16)


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _IDCT_C.T @ coef @ _IDCT_C


class _Huff:
    """Canonical Huffman decode table from DHT (bits, vals), compiled
    to a 2^16-entry flat LUT: every table entry whose index starts
    with a code's bit pattern maps to ``(symbol << 5) | code_length``
    (0 = invalid prefix). One 16-bit peek + one indexed load decodes a
    whole symbol — the per-BIT tree walk this replaced (r8) was the
    decoder's bottleneck (one Python dict probe per bit, ~8 per
    symbol; megapixel images cost seconds in that loop alone)."""

    def __init__(self, bits, vals):
        self.lut16 = np.zeros(1 << 16, np.int32)
        code = k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln]):
                base = code << (16 - ln)
                # hostile DHTs can overflow the canonical code space;
                # numpy slicing clamps, leaving the range invalid (0)
                self.lut16[base: base + (1 << (16 - ln))] = \
                    (vals[k] << 5) | ln
                code += 1
                k += 1
            code <<= 1
        # array('i') mirror: C-int indexing for the inlined fast
        # path (a numpy scalar load + int() costs ~10x) at 4 bytes
        # per entry instead of a Python list's ~28
        import array as _array
        self.lut16_l = _array.array("i", self.lut16.tobytes())

    def decode(self, br):
        v = int(self.lut16[br.peek16()])
        if v == 0:
            raise ValueError("jpeg: invalid Huffman code")
        br.skip(v & 31)
        return v >> 5


class _BitReader:
    """Entropy-coded segment reader. The segment up to the next real
    marker (0xFF followed by non-0x00) is destuffed ONCE with a
    C-speed bytes.replace, then a per-byte uint32 window array serves
    16-bit peeks and n-bit receives in O(1) Python ops each — versus
    the per-bit byte-feed loop this replaced (r8). A marker
    interrupting entropy data simply terminates the segment, so a
    read past its bits reports a truncated stream (same ValueError
    family the err channel catches). ``pos`` always holds the
    original-stream offset of the marker that ends the current
    segment — the scan loop resumes its marker walk there."""

    def __init__(self, data, pos):
        self.d = data
        self._load_segment(pos)

    def _load_segment(self, pos):
        d = self.d
        i = pos
        while True:
            j = d.find(b"\xff", i)
            if j < 0:
                end = len(d)
                break
            if j + 1 >= len(d) or d[j + 1] != 0x00:
                end = j          # real marker (or lone trailing 0xFF)
                break
            i = j + 2            # stuffed 0xFF00: data byte, keep going
        seg = d[pos:end].replace(b"\xff\x00", b"\xff")
        # FOUR padding bytes: w32 then has len(seg)+1 entries, so the
        # window at byte index len(seg) — reached when p lands exactly
        # on total_bits at a byte boundary — stays in bounds (review
        # r8: with 3 bytes it was an IndexError escaping the err
        # channel on 36/153 truncation points of a valid stream).
        # CONSUMING padded bits still raises via the total_bits checks.
        buf = np.frombuffer(seg + b"\x00\x00\x00\x00", np.uint8)
        u = buf.astype(np.uint32)
        w32 = (u[:-3] << 24) | (u[1:-2] << 16) | (u[2:-1] << 8) | u[3:]
        self.w32 = w32
        # array('I') mirror for the inlined fast path: C-int indexing
        # like a list at 4 bytes/entry — a list of Python ints costs
        # ~28 bytes/entry, a ~40x amplification of the entropy segment
        # that 32 parallel megapixel decodes would multiply into GBs
        # of uncounted allocation (review r8). Built LAZILY: the
        # progressive/general paths read only the numpy window, so
        # they skip the conversion and the second copy entirely.
        self._w32_arr = None
        self.total_bits = 8 * len(seg)
        self.p = 0
        self.pos = end

    def w32_mirror(self):
        if self._w32_arr is None:
            import array as _array
            self._w32_arr = _array.array("I", self.w32.tobytes())
        return self._w32_arr

    def peek16(self):
        p = self.p
        return (int(self.w32[p >> 3]) >> (16 - (p & 7))) & 0xFFFF

    def skip(self, n):
        p = self.p + n
        if p > self.total_bits:
            raise ValueError("jpeg: truncated entropy stream")
        self.p = p

    def bit(self):
        p = self.p
        if p >= self.total_bits:
            raise ValueError("jpeg: truncated entropy stream")
        self.p = p + 1
        return (int(self.w32[p >> 3]) >> (31 - (p & 7))) & 1

    def receive(self, n):
        if n == 0:
            return 0
        p = self.p
        if p + n > self.total_bits:
            raise ValueError("jpeg: truncated entropy stream")
        self.p = p + n
        return (int(self.w32[p >> 3]) >> (32 - (p & 7) - n)) \
            & ((1 << n) - 1)

    def next_marker_and_resume(self):
        """Return the 2-byte marker terminating the current segment
        and start reading the entropy segment that follows it."""
        if self.pos + 1 >= len(self.d):
            raise ValueError("jpeg: truncated at restart")
        mk = self.d[self.pos:self.pos + 2]
        self._load_segment(self.pos + 2)
        return mk


def _extend(v, n):
    """T.81 EXTEND: n-bit magnitude -> signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def parse_jpeg(data: bytes) -> np.ndarray:
    """Baseline OR progressive JPEG -> (h, w, 3) uint8 RGB (grayscale
    replicated). Coefficient-accumulating: every scan — baseline's one
    interleaved scan, or progressive's many (spectral selection and
    successive approximation, DC and AC, first and refinement passes,
    per-scan DHT overrides, restart intervals) — writes RAW
    coefficients into per-component block arrays; dequant + IDCT +
    upsample + color conversion run once at EOI."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    progressive = False
    ri = 0
    st = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        m = data[pos + 1]
        if m == 0xFF:                        # legal fill byte padding
            pos += 1
            continue
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:                        # EOI: reconstruct
            if st is None:
                raise ValueError("jpeg: no scan data")
            return _reconstruct(st, qt)
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if seglen < 2 or len(body) != seglen - 2:
            raise ValueError("jpeg: truncated segment")
        if m == 0xDB:                        # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                raw = body[p:p + n]
                if len(raw) < n:
                    raise ValueError("jpeg: truncated DQT")
                tbl = (np.frombuffer(raw, ">u2") if pq
                       else np.frombuffer(raw, np.uint8))
                q = np.zeros((8, 8), np.int32)
                for i, (r, c) in enumerate(_ZZ):
                    q[r, c] = int(tbl[i])
                qt[tq] = q
                p += n
        elif m in (0xC0, 0xC1, 0xC2):        # SOF0/1 baseline, SOF2 prog
            progressive = (m == 0xC2)
            if len(body) < 6:
                raise ValueError("jpeg: truncated SOF")
            prec = body[0]
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision")
            if len(body) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated SOF components")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq_})
            st = _init_state((h, w, comps))
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline/progressive DCT (SOF0/1/2) "
                f"supported, got SOF marker 0x{m:02X}")
        elif m == 0xC4:                      # DHT (per-scan overrides)
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = [0] + list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("jpeg: truncated DHT")
                (huff_ac if tc else huff_dc)[th] = _Huff(bits, vals)
                p += 17 + nv
        elif m == 0xDD:                      # DRI
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI")
            ri = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:                      # SOS (one of possibly many)
            if st is None:
                raise ValueError("jpeg: SOS before SOF")
            if not body:
                raise ValueError("jpeg: empty SOS")
            ns = body[0]
            if not 1 <= ns <= 4 or len(body) < 1 + 2 * ns + 3:
                raise ValueError("jpeg: bad SOS component count")
            scan = []
            for i in range(ns):
                cs, tds = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tds >> 4, tds & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            pos = _decode_one_scan(data, pos + seglen, st, scan,
                                   huff_dc, huff_ac, ri, ss, se, ah,
                                   al, progressive)
            continue
        pos += seglen
    raise ValueError("jpeg: truncated before EOI")


def _init_state(sof):
    h, w, comps = sof
    if w <= 0 or h <= 0:
        raise ValueError("jpeg: non-positive dimensions")
    if w * h > JPEG_MAX_PIXELS:
        raise ValueError(
            f"jpeg: {w}x{h} exceeds the decoder pixel cap "
            f"({JPEG_MAX_PIXELS})")
    if len(comps) not in (1, 3):
        raise ValueError("jpeg: only 1 or 3 components")
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("jpeg: unsupported sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        # block grid incl. MCU padding (interleaved scans cover it) …
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        # … and the TRUE block grid (non-interleaved scans cover only
        # this, T.81 A.2.2)
        cw = (w * c["h"] + hmax - 1) // hmax
        ch_ = (h * c["v"] + vmax - 1) // vmax
        c["nbx"] = (cw + 7) // 8
        c["nby"] = (ch_ + 7) // 8
    coef_bytes = sum(c["by"] * c["bx"] * 64 * 8 for c in comps)
    if 3 * coef_bytes > JPEG_MAX_ALLOC_BYTES:
        raise ValueError(
            f"jpeg: {w}x{h}x{len(comps)} estimated peak allocation "
            f"{3 * coef_bytes} exceeds the byte budget "
            f"({JPEG_MAX_ALLOC_BYTES})")
    for c in comps:
        # int64: DC predictors accumulate across up to ~2^20 blocks
        # at |diff| <= 32767 — int32 would overflow with a numpy
        # OverflowError that escapes the err channel
        c["coef"] = np.zeros((c["by"], c["bx"], 8, 8), np.int64)
        c["pred"] = 0
        c["eobrun"] = 0
    return {"sof": sof, "hmax": hmax, "vmax": vmax,
            "mcux": mcux, "mcuy": mcuy}


def _decode_one_scan(data, pos, st, scan, huff_dc, huff_ac, ri,
                     ss, se, ah, al, progressive):
    comps = st["sof"][2]
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError("jpeg: scan references unknown component")
        c["td"], c["ta"] = td, ta
        c["pred"] = 0
        c["eobrun"] = 0
        order.append(c)
    br = _BitReader(data, pos)
    if not progressive:
        _scan_blocks(br, st, order, huff_dc, huff_ac, ri,
                     mode="full", ah=0, al=0)
    elif ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan with Se != 0")
        _scan_blocks(br, st, order, huff_dc, huff_ac, ri,
                     mode="dc", ah=ah, al=al)
    else:
        if len(order) != 1:
            raise ValueError(
                "jpeg: progressive AC scan must be single-component")
        if not 1 <= ss <= se <= 63:
            raise ValueError("jpeg: bad spectral selection range")
        _scan_ac(br, order[0], huff_ac, ri, ss, se, ah, al)
    # resume the marker walk at the next marker after the entropy data
    p = br.pos
    while p + 1 < len(data) and not (data[p] == 0xFF
                                     and data[p + 1] != 0x00):
        p += 1
    if p + 1 >= len(data):
        raise ValueError("jpeg: truncated after scan")
    return p


def _restart(br, comps):
    mk = br.next_marker_and_resume()
    if len(mk) < 2 or mk[0] != 0xFF or not (0xD0 <= mk[1] <= 0xD7):
        raise ValueError("jpeg: expected restart marker")
    for c in comps:
        c["pred"] = 0
        c["eobrun"] = 0


_ZZ_R = tuple(z[0] for z in _ZZ)
_ZZ_C = tuple(z[1] for z in _ZZ)

# dispatch flag so tests can pin the inlined baseline fast path
# against the general method-based scan loop
_FAST_BASELINE = True


def _scan_blocks_baseline_fast(br, st, order, huff_dc, huff_ac, ri):
    """Baseline sequential scan with the bit-reader state hoisted into
    locals and the Huffman/receive/extend steps inlined (r8): the
    method-call version spent ~60% of megapixel decode time on Python
    call overhead for the ~64 symbol decodes per block. Semantics are
    IDENTICAL to the general path — the progressive scans keep the
    readable method-based form, and the pixel-pinned test corpus
    covers both."""
    interleaved = len(order) > 1
    if interleaved:
        n_units_x = st["mcux"]
        n_units = st["mcux"] * st["mcuy"]
    else:
        n_units_x = order[0]["nbx"]
        n_units = order[0]["nbx"] * order[0]["nby"]
    plan = []
    for c in order:
        dct = huff_dc.get(c.get("td"))
        act = huff_ac.get(c.get("ta"))
        if dct is None or act is None:
            raise ValueError("jpeg: missing Huffman table")
        plan.append((c, dct.lut16_l, act.lut16_l))
    zzr, zzc = _ZZ_R, _ZZ_C
    w32 = br.w32_mirror()
    p = br.p
    total = br.total_bits
    for mi in range(n_units):
        if ri and mi and mi % ri == 0:
            br.p = p
            _restart(br, order)
            w32 = br.w32_mirror()
            p = br.p
            total = br.total_bits
        my, mx = divmod(mi, n_units_x)
        for c, dlut, alut in plan:
            hh = c["h"] if interleaved else 1
            vv = c["v"] if interleaved else 1
            coef = c["coef"]
            for vy in range(vv):
                for vx in range(hh):
                    if interleaved:
                        blk = coef[my * c["v"] + vy, mx * c["h"] + vx]
                    else:
                        blk = coef[my, mx]
                    if p >= total:
                        raise ValueError(
                            "jpeg: truncated entropy stream")
                    v = dlut[(w32[p >> 3]
                              >> (16 - (p & 7))) & 0xFFFF]
                    if v == 0:
                        raise ValueError("jpeg: invalid Huffman code")
                    p += v & 31
                    if p > total:
                        raise ValueError(
                            "jpeg: truncated entropy stream")
                    t = v >> 5
                    if t:
                        if t > 15:           # hostile DHT value
                            raise ValueError(
                                "jpeg: bad DC size category")
                        if p + t > total:
                            raise ValueError(
                                "jpeg: truncated entropy stream")
                        mag = (w32[p >> 3]
                               >> (32 - (p & 7) - t)) & ((1 << t) - 1)
                        p += t
                        c["pred"] += (mag if mag >= (1 << (t - 1))
                                      else mag - (1 << t) + 1)
                    blk[0, 0] = c["pred"]
                    k = 1
                    while k < 64:
                        if p >= total:
                            raise ValueError(
                                "jpeg: truncated entropy stream")
                        v = alut[(w32[p >> 3]
                                  >> (16 - (p & 7))) & 0xFFFF]
                        if v == 0:
                            raise ValueError(
                                "jpeg: invalid Huffman code")
                        p += v & 31
                        if p > total:
                            raise ValueError(
                                "jpeg: truncated entropy stream")
                        rs = v >> 5
                        s = rs & 0xF
                        if s == 0:
                            if rs >> 4 == 15:        # ZRL
                                k += 16
                                continue
                            break                    # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        if p + s > total:
                            raise ValueError(
                                "jpeg: truncated entropy stream")
                        mag = (w32[p >> 3]
                               >> (32 - (p & 7) - s)) & ((1 << s) - 1)
                        p += s
                        blk[zzr[k], zzc[k]] = (
                            mag if mag >= (1 << (s - 1))
                            else mag - (1 << s) + 1)
                        k += 1
    br.p = p


def _scan_blocks(br, st, order, huff_dc, huff_ac, ri, mode, ah, al):
    """Baseline full blocks (mode='full') or progressive DC passes
    (mode='dc'; first when ah==0, refinement otherwise). Multi-
    component scans walk the MCU grid; single-component scans are
    non-interleaved and walk the component's true block grid."""
    if mode == "full" and _FAST_BASELINE:
        # tests flip _FAST_BASELINE to pin fast == general bit-for-bit
        return _scan_blocks_baseline_fast(br, st, order, huff_dc,
                                          huff_ac, ri)
    interleaved = len(order) > 1
    if interleaved:
        n_units_x = st["mcux"]
        n_units = st["mcux"] * st["mcuy"]
    else:
        n_units_x = order[0]["nbx"]
        n_units = order[0]["nbx"] * order[0]["nby"]
    for mi in range(n_units):
        if ri and mi and mi % ri == 0:
            _restart(br, order)
        my, mx = divmod(mi, n_units_x)
        for c in order:
            hh = c["h"] if interleaved else 1
            vv = c["v"] if interleaved else 1
            for vy in range(vv):
                for vx in range(hh):
                    if interleaved:
                        blk = c["coef"][my * c["v"] + vy,
                                        mx * c["h"] + vx]
                    else:
                        blk = c["coef"][my, mx]
                    if mode == "full":
                        _block_baseline(br, c, blk, huff_dc, huff_ac)
                    elif ah == 0:            # DC first (point shift al)
                        t = huff_dc.get(c.get("td"))
                        if t is None:
                            raise ValueError("jpeg: missing DC table")
                        s = t.decode(br)
                        if s > 15:               # hostile DHT value
                            raise ValueError(
                                "jpeg: bad DC size category")
                        c["pred"] += _extend(br.receive(s), s)
                        blk[0, 0] = c["pred"] << al
                    else:                    # DC refinement: one bit
                        if br.bit():
                            blk[0, 0] |= (1 << al)


def _block_baseline(br, c, blk, huff_dc, huff_ac):
    dct = huff_dc.get(c.get("td"))
    act = huff_ac.get(c.get("ta"))
    if dct is None or act is None:
        raise ValueError("jpeg: missing Huffman table")
    t = dct.decode(br)
    if t > 15:                               # hostile DHT value
        raise ValueError("jpeg: bad DC size category")
    c["pred"] += _extend(br.receive(t), t)
    blk[0, 0] = c["pred"]
    k = 1
    while k < 64:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                      # ZRL
                k += 16
                continue
            break                            # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        zr, zc = _ZZ[k]
        blk[zr, zc] = _extend(br.receive(s), s)
        k += 1


def _scan_ac(br, c, huff_ac, ri, ss, se, ah, al):
    act = huff_ac.get(c.get("ta"))
    if act is None:
        raise ValueError("jpeg: missing AC table")
    n_units = c["nbx"] * c["nby"]
    for mi in range(n_units):
        if ri and mi and mi % ri == 0:
            _restart(br, [c])
        my, mx = divmod(mi, c["nbx"])
        blk = c["coef"][my, mx]
        if ah == 0:
            _ac_first(br, c, blk, act, ss, se, al)
        else:
            _ac_refine(br, c, blk, act, ss, se, al)


def _ac_first(br, c, blk, act, ss, se, al):
    """Progressive AC first pass: magnitudes point-shifted by al,
    EOB runs span whole blocks (T.81 G.1.2.2)."""
    if c["eobrun"] > 0:
        c["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = act.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                      # ZRL
                k += 16
                continue
            c["eobrun"] = (1 << r) - 1       # EOBn: this block + n-1
            if r:
                c["eobrun"] += br.receive(r)
            return
        k += r
        if k > se:
            raise ValueError("jpeg: AC index overflow")
        zr, zc = _ZZ[k]
        blk[zr, zc] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, c, blk, act, ss, se, al):
    """Successive-approximation AC refinement — control flow
    transcribed from T.81 G.1.2.3 (the decode_mcu_AC_refine shape):
    nonzero-history coefficients take a correction bit whenever the
    scan passes them; zero-history positions count against the run;
    an EOB run corrects the remainder of the current block, then
    whole blocks."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if c["eobrun"] == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0xF
            s_val = 0
            if s == 0:
                if r != 15:
                    c["eobrun"] = (1 << r)
                    if r:
                        c["eobrun"] += br.receive(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: bad refinement size")
                s_val = p1 if br.bit() else m1
            while k <= se:
                zr, zc = _ZZ[k]
                v = blk[zr, zc]
                if v != 0:
                    if br.bit() and (v & p1) == 0:
                        blk[zr, zc] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zr, zc = _ZZ[k]
                blk[zr, zc] = s_val
            k += 1
    if c["eobrun"] > 0:
        while k <= se:
            zr, zc = _ZZ[k]
            v = blk[zr, zc]
            if v != 0:
                if br.bit() and (v & p1) == 0:
                    blk[zr, zc] = v + (p1 if v >= 0 else m1)
            k += 1
        c["eobrun"] -= 1


def _reconstruct(st, qt):
    h, w, comps = st["sof"]
    hmax, vmax = st["hmax"], st["vmax"]
    out = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("jpeg: missing quant table")
        # dequant + IDCT broadcast over the whole block array (the
        # matmul maps over leading dims), then blocks tile into the
        # plane — no per-block Python loop on the decode hot path
        coefq = c["coef"].astype(np.float64) * q
        blocks = _IDCT_C.T @ coefq @ _IDCT_C + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(
            c["by"] * 8, c["bx"] * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)),
                   0, 255).astype(np.uint8)


# --------------------------- encoder (test/oracle harness) ------------------

# the T.81 FDCT definition tensor, evaluated term-by-term exactly as
# the O(N^4) definition sum (einsum only batches the same products —
# deliberately NOT the decoder's matrix-factorized IDCT path, so the
# encoder stays an independent oracle). Python-loop evaluation made
# megapixel test payloads take minutes to build (r8).
_FDCT_T = np.zeros((8, 8, 8, 8))
for _u in range(8):
    for _v in range(8):
        _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _cv = (1 / np.sqrt(2)) if _v == 0 else 1.0
        for _x in range(8):
            for _y in range(8):
                _FDCT_T[_u, _v, _x, _y] = (
                    0.25 * _cu * _cv
                    * np.cos((2 * _x + 1) * _u * np.pi / 16)
                    * np.cos((2 * _y + 1) * _v * np.pi / 16))
del _u, _v, _cu, _cv, _x, _y


def _fdct_def(block: np.ndarray) -> np.ndarray:
    """FDCT as the T.81 definition sum — independent of the decoder's
    matrix IDCT (see ``_FDCT_T``)."""
    return np.einsum("uvxy,xy->uv", _FDCT_T, block)


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            pad = (1 << (8 - self.n)) - 1     # 1-fill per spec
            self.acc = (self.acc << (8 - self.n)) | pad
            self.bytes.append(self.acc)
            if self.acc == 0xFF:
                self.bytes.append(0x00)
            self.acc = 0
            self.n = 0


def _enc_table(bits, vals):
    out = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v):
    n, a = 0, abs(v)
    while a:
        a >>= 1
        n += 1
    return n


def _dht_segment(tc, th, bits, vals):
    body = bytes([tc << 4 | th]) + bytes(bits[1:]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _pad_plane(p, ph, pw, h, w):
    """Edge-replicate ``p`` (h, w) to the MCU-padded (ph, pw)."""
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[-1:, :]
    pp[:, w:] = pp[:, w - 1:w]
    return pp


def _put_ac_runlength(bw, seq, enc):
    """Zigzag AC sequence -> run/size symbols + ZRL + trailing EOB
    (the emission both encoders share)."""
    last = -1
    for k, v in enumerate(seq):
        if v:
            last = k
    run = 0
    for k in range(last + 1):
        v = seq[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc[0xF0]
            bw.put(code, ln)
            run -= 16
        sz = _category(v)
        code, ln = enc[(run << 4) | sz]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    if last < len(seq) - 1:
        code, ln = enc[0x00]
        bw.put(code, ln)


def encode_jpeg(img: np.ndarray, qtable: np.ndarray | None = None,
                gray: bool = False, sampling: tuple = (1, 1),
                restart_interval: int = 0) -> bytes:
    """Baseline encoder for deterministic test/oracle payloads.

    ``sampling`` = luma (h, v): (1,1)=4:4:4, (2,1)=4:2:2, (2,2)=4:2:0
    (chroma box-mean downsampled). ``qtable`` (default all-16) is
    used for every component — an all-8 table quantizes flat blocks
    LOSSLESSLY (DC of a flat block of value c-128 is exactly 8(c-128),
    see the module docstring), the property the exact oracles use."""
    if qtable is None:
        qtable = np.full((8, 8), 16, np.int32)
    sh_, sv = (1, 1) if gray else sampling
    h, w = img.shape[:2]
    if gray:
        comps = [np.asarray(img[..., 0] if img.ndim == 3 else img,
                            np.float64)]
    else:
        rgb = np.asarray(img, np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        comps = [0.299 * r + 0.587 * g + 0.114 * b,
                 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    nc = len(comps)
    mh, mw = 8 * sv, 8 * sh_
    ph, pw = (h + mh - 1) // mh * mh, (w + mw - 1) // mw * mw

    comps = [_pad_plane(p, ph, pw, h, w) for p in comps]
    if nc == 3 and (sv > 1 or sh_ > 1):
        def down(p):
            return p.reshape(ph // sv, sv, pw // sh_, sh_).mean(
                axis=(1, 3))
        comps = [comps[0], down(comps[1]), down(comps[2])]

    out = bytearray(b"\xff\xd8")
    zz = bytes(int(qtable[r, c]) for r, c in _ZZ)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz
    sof = struct.pack(">BHHB", 8, h, w, nc)
    sof += bytes([1, (sh_ << 4) | sv, 0])
    for i in range(1, nc):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    out += _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if nc == 3:
        out += _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc]) + bytes([1, 0x00])
    for i in range(1, nc):
        sos += bytes([i + 1, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_enc = [_enc_table(_DC_LUM_BITS, _DC_LUM_VALS),
              _enc_table(_DC_CHR_BITS, _DC_CHR_VALS)]
    ac_enc = [_enc_table(_AC_LUM_BITS, _AC_LUM_VALS),
              _enc_table(_AC_CHR_BITS, _AC_CHR_VALS)]
    state = {"bw": _BitWriter(), "preds": [0] * nc}

    def put_block(blk, ci):
        t = 0 if ci == 0 else 1
        bw = state["bw"]
        coef = np.round(_fdct_def(blk - 128.0) / qtable).astype(int)
        diff = int(coef[0, 0]) - state["preds"][ci]
        state["preds"][ci] = int(coef[0, 0])
        cat = _category(diff)
        code, ln = dc_enc[t][cat]
        bw.put(code, ln)
        if cat:
            bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        _put_ac_runlength(
            bw, [int(coef[_ZZ[k][0], _ZZ[k][1]]) for k in range(1, 64)],
            ac_enc[t])

    n_mcux, n_mcuy = pw // mw, ph // mh
    for mi in range(n_mcux * n_mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            state["bw"].flush()
            out += state["bw"].bytes
            state["bw"] = _BitWriter()
            out += bytes([0xFF,
                          0xD0 + ((mi // restart_interval - 1) % 8)])
            state["preds"] = [0] * nc
        my, mx = divmod(mi, n_mcux)
        for vy in range(sv):
            for vx in range(sh_):
                py, px = (my * sv + vy) * 8, (mx * sh_ + vx) * 8
                put_block(comps[0][py:py + 8, px:px + 8], 0)
        for ci in range(1, nc):
            put_block(comps[ci][my * 8:my * 8 + 8,
                                mx * 8:mx * 8 + 8], ci)
    state["bw"].flush()
    out += state["bw"].bytes
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_gray(img: np.ndarray,
                                 qtable: np.ndarray | None = None
                                 ) -> bytes:
    """Three-scan PROGRESSIVE grayscale encoder for test/oracle
    payloads: DC first pass at Al=1, AC first pass (spectral 1-63,
    per-block EOB — expressible with the Annex-K table), DC
    refinement at Al=0. Flat images with an all-8 quant table still
    decode EXACTLY (same lossless-flat-block property as the baseline
    encoder), so q_jpeg_real can route half its payloads through the
    progressive decode path under the same closed-form oracle."""
    if qtable is None:
        qtable = np.full((8, 8), 16, np.int32)
    h, w = img.shape[:2]
    plane = np.asarray(img[..., 0] if img.ndim == 3 else img,
                       np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pp = _pad_plane(plane, ph, pw, h, w)
    nby, nbx = ph // 8, pw // 8
    coefs = np.zeros((nby, nbx, 8, 8), np.int64)
    for by in range(nby):
        for bx in range(nbx):
            blk = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coefs[by, bx] = np.round(_fdct_def(blk) / qtable)

    out = bytearray(b"\xff\xd8")
    zz = bytes(int(qtable[r, c]) for r, c in _ZZ)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    out += _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)

    def sos(ss, se, ah, al):
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    dc_enc = _enc_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_enc = _enc_table(_AC_LUM_BITS, _AC_LUM_VALS)

    # scan 1: DC first, point transform Al=1 (arithmetic shift)
    out += sos(0, 0, 0, 1)
    bw = _BitWriter()
    pred = 0
    for by in range(nby):
        for bx in range(nbx):
            dc = int(coefs[by, bx, 0, 0]) >> 1
            diff = dc - pred
            pred = dc
            cat = _category(diff)
            code, ln = dc_enc[cat]
            bw.put(code, ln)
            if cat:
                bw.put(diff if diff >= 0 else diff + (1 << cat) - 1,
                       cat)
    bw.flush()
    out += bw.bytes

    # scan 2: AC first, spectral 1-63 at Al=0, per-block EOB0
    out += sos(1, 63, 0, 0)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            blk = coefs[by, bx]
            _put_ac_runlength(
                bw,
                [int(blk[_ZZ[k][0], _ZZ[k][1]]) for k in range(1, 64)],
                ac_enc)
    bw.flush()
    out += bw.bytes

    # scan 3: DC refinement, the Al=0 bit per block
    out += sos(0, 0, 1, 0)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            bw.put(int(coefs[by, bx, 0, 0]) & 1, 1)
    bw.flush()
    out += bw.bytes
    return bytes(out + b"\xff\xd9")
