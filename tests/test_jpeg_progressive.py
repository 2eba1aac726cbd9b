"""Progressive JPEG decode (late r7) — the exact oracle: serialize the
SAME random coefficient arrays as (a) one baseline interleaved scan
and (b) progressive multi-scan streams (spectral selection and full
successive approximation, with EOB runs, per-scan custom DHTs and
restart intervals), then require the two decodes to be PIXEL
IDENTICAL. The serializers below are written from T.81 Annex G
independently of the decoder's scan loops; identical coefficients in,
identical pixels out pins every progressive path against the
already-proven baseline path."""

import struct

import numpy as np
import pytest

from jsonextract_spark.datapipe.jpeg import (
    _AC_CHR_BITS, _AC_CHR_VALS, _AC_LUM_BITS, _AC_LUM_VALS,
    _BitWriter, _DC_CHR_BITS, _DC_CHR_VALS, _DC_LUM_BITS, _DC_LUM_VALS,
    _ZZ, _category, _enc_table, parse_jpeg)

pytestmark = pytest.mark.spark

DC_ENC = [_enc_table(_DC_LUM_BITS, _DC_LUM_VALS),
          _enc_table(_DC_CHR_BITS, _DC_CHR_VALS)]
AC_ENC = [_enc_table(_AC_LUM_BITS, _AC_LUM_VALS),
          _enc_table(_AC_CHR_BITS, _AC_CHR_VALS)]

# progressive scans need EOBn symbols the Annex-K baseline tables lack
# (real encoders ship per-scan optimized DHTs): every (run<<4 | size)
# for size 0-6, all at code length 8 — a valid (incomplete) canonical
# prefix code
PROG_AC_SYMS = [(r << 4) | sz for r in range(16) for sz in range(7)]
PROG_AC_BITS = [0] * 17
PROG_AC_BITS[8] = len(PROG_AC_SYMS)
PROG_AC_ENC = _enc_table(PROG_AC_BITS, PROG_AC_SYMS)


def _dht(tc, th, bits, vals):
    body = bytes([tc << 4 | th]) + bytes(bits[1:]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def headers(w, h, comps, qtable, sof_marker):
    out = bytearray(b"\xff\xd8")
    zz = bytes(int(qtable[r, c]) for r, c in _ZZ)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz
    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["h"] << 4) | c["v"], 0])
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if nc == 3:
        out += _dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += _dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    return out


def prog_dht():
    return (_dht(1, 0, PROG_AC_BITS, PROG_AC_SYMS)
            + _dht(1, 1, PROG_AC_BITS, PROG_AC_SYMS))


def sos_header(comp_ids, ss, se, ah, al):
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        t = 0 if cid == 1 else 1
        body += bytes([cid, (t << 4) | t])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def put_v(bw, v, cat):
    bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)


def baseline_stream(coefs, comps):
    bw = _BitWriter()
    preds = [0] * len(comps)
    mcux = coefs[0].shape[1] // comps[0]["h"]
    mcuy = coefs[0].shape[0] // comps[0]["v"]
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            t = 0 if ci == 0 else 1
            for vy in range(c["v"]):
                for vx in range(c["h"]):
                    blk = coefs[ci][my * c["v"] + vy, mx * c["h"] + vx]
                    dc = int(blk[0, 0])
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    cat = _category(diff)
                    code, ln = DC_ENC[t][cat]
                    bw.put(code, ln)
                    if cat:
                        put_v(bw, diff, cat)
                    seq = [int(blk[_ZZ[k][0], _ZZ[k][1]])
                           for k in range(1, 64)]
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
                            code, ln = AC_ENC[t][0xF0]
                            bw.put(code, ln)
                            run -= 16
                        sz = _category(v)
                        code, ln = AC_ENC[t][(run << 4) | sz]
                        bw.put(code, ln)
                        put_v(bw, v, sz)
                        run = 0
                    if last < 62:
                        code, ln = AC_ENC[t][0x00]
                        bw.put(code, ln)
    bw.flush()
    return bytes(bw.bytes)


def dc_first_scan(coefs, comps, al, ri=0):
    out = bytearray()
    bw = _BitWriter()
    preds = [0] * len(comps)
    mcux = coefs[0].shape[1] // comps[0]["h"]
    mcuy = coefs[0].shape[0] // comps[0]["v"]
    for mi in range(mcux * mcuy):
        if ri and mi and mi % ri == 0:
            bw.flush()
            out += bw.bytes
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((mi // ri - 1) % 8)])
            preds = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            t = 0 if ci == 0 else 1
            for vy in range(c["v"]):
                for vx in range(c["h"]):
                    blk = coefs[ci][my * c["v"] + vy, mx * c["h"] + vx]
                    dc = int(blk[0, 0]) >> al    # arithmetic shift
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    cat = _category(diff)
                    code, ln = DC_ENC[t][cat]
                    bw.put(code, ln)
                    if cat:
                        put_v(bw, diff, cat)
    bw.flush()
    return bytes(out + bw.bytes)


def dc_refine_scan(coefs, comps, al, ri=0):
    out = bytearray()
    bw = _BitWriter()
    mcux = coefs[0].shape[1] // comps[0]["h"]
    mcuy = coefs[0].shape[0] // comps[0]["v"]
    for mi in range(mcux * mcuy):
        if ri and mi and mi % ri == 0:
            bw.flush()
            out += bw.bytes
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((mi // ri - 1) % 8)])
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            for vy in range(c["v"]):
                for vx in range(c["h"]):
                    blk = coefs[ci][my * c["v"] + vy, mx * c["h"] + vx]
                    bw.put((int(blk[0, 0]) >> al) & 1, 1)
    bw.flush()
    return bytes(out + bw.bytes)


class ProgWriter:
    """AC progressive scan writer: EOB runs + buffered correction bits
    (the encode_mcu_AC_first/refine shapes from T.81 Annex G)."""

    def __init__(self):
        self.bw = _BitWriter()
        self.eobrun = 0
        self.bits = []

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = PROG_AC_ENC[nbits << 4]
            self.bw.put(code, ln)
            if nbits:
                self.bw.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.bits:
            self.bw.put(b, 1)
        self.bits = []

    def ac_first_block(self, blk, ss, se, al):
        seq = [int(blk[_ZZ[k][0], _ZZ[k][1]])
               for k in range(ss, se + 1)]
        pt = [((abs(v) >> al) * (1 if v >= 0 else -1)) for v in seq]
        last = -1
        for k, v in enumerate(pt):
            if v:
                last = k
        if last < 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()
            return
        self.emit_eobrun()
        run = 0
        for k in range(last + 1):
            v = pt[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = PROG_AC_ENC[0xF0]
                self.bw.put(code, ln)
                run -= 16
            sz = _category(v)
            code, ln = PROG_AC_ENC[(run << 4) | sz]
            self.bw.put(code, ln)
            put_v(self.bw, v, sz)
            run = 0
        if last < se - ss:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def ac_refine_block(self, blk, ss, se, al):
        seq = [int(blk[_ZZ[k][0], _ZZ[k][1]])
               for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in seq]
        eob = -1
        for k, a in enumerate(absv):
            if a == 1:
                eob = k
        run = 0
        pend = []
        for k, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                self.emit_eobrun()
                code, ln = PROG_AC_ENC[0xF0]
                self.bw.put(code, ln)
                run -= 16
                for b in pend:
                    self.bw.put(b, 1)
                pend = []
            if a > 1:
                pend.append(a & 1)         # history-nonzero correction
                continue
            self.emit_eobrun()             # a == 1: newly nonzero
            code, ln = PROG_AC_ENC[(run << 4) | 1]
            self.bw.put(code, ln)
            self.bw.put(1 if seq[k] >= 0 else 0, 1)
            for b in pend:
                self.bw.put(b, 1)
            pend = []
            run = 0
        if run > 0 or pend:
            self.eobrun += 1
            self.bits.extend(pend)
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()

    def finish(self):
        self.emit_eobrun()
        self.bw.flush()
        return bytes(self.bw.bytes)


def ac_scan(coefs_c, ss, se, ah, al, ri=0):
    nby, nbx = coefs_c.shape[:2]
    out = bytearray()
    pw = ProgWriter()
    for mi in range(nbx * nby):
        if ri and mi and mi % ri == 0:
            out += pw.finish()
            out += bytes([0xFF, 0xD0 + ((mi // ri - 1) % 8)])
            pw = ProgWriter()
        my, mx = divmod(mi, nbx)
        blk = coefs_c[my, mx]
        if ah == 0:
            pw.ac_first_block(blk, ss, se, al)
        else:
            pw.ac_refine_block(blk, ss, se, al)
    return bytes(out + pw.finish())


def rand_coefs(rng, by, bx, density=0.2, amp=60):
    c = np.zeros((by, bx, 8, 8), np.int32)
    mask = rng.random((by, bx, 8, 8)) < density
    c[mask] = rng.randint(-amp, amp + 1, mask.sum())
    return c


def build_and_compare(coefs, comps_spec, w, h, scans, ri=0):
    """Decode baseline vs progressive serializations of ``coefs``."""
    hmax = max(c["h"] for c in comps_spec)
    vmax = max(c["v"] for c in comps_spec)
    q = np.full((8, 8), 3, np.int32)
    ids = [i + 1 for i in range(len(comps_spec))]
    base = headers(w, h, comps_spec, q, b"\xff\xc0") \
        + sos_header(ids, 0, 63, 0, 0) \
        + baseline_stream(coefs, comps_spec) + b"\xff\xd9"
    img_base = parse_jpeg(base)

    prog = bytearray(headers(w, h, comps_spec, q, b"\xff\xc2"))
    prog += prog_dht()
    if ri:
        prog += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    for scan in scans:
        kind = scan[0]
        if kind == "dc_first":
            prog += sos_header(ids, 0, 0, 0, scan[1])
            prog += dc_first_scan(coefs, comps_spec, scan[1], ri=ri)
        elif kind == "dc_refine":
            prog += sos_header(ids, 0, 0, scan[1] + 1, scan[1])
            prog += dc_refine_scan(coefs, comps_spec, scan[1], ri=ri)
        else:
            _, ci, ss, se, ah, al = scan
            c = comps_spec[ci]
            cw = (w * c["h"] + hmax - 1) // hmax
            ch_ = (h * c["v"] + vmax - 1) // vmax
            nbx, nby = (cw + 7) // 8, (ch_ + 7) // 8
            prog += sos_header([ci + 1], ss, se, ah, al)
            prog += ac_scan(coefs[ci][:nby, :nbx], ss, se, ah, al,
                            ri=ri)
    prog += b"\xff\xd9"
    img_prog = parse_jpeg(bytes(prog))
    assert np.array_equal(img_base, img_prog), \
        (w, h, [s[0] for s in scans])


SPECTRAL = [("dc_first", 0), ("ac", 0, 1, 5, 0, 0),
            ("ac", 0, 6, 63, 0, 0)]
SUCC = [("dc_first", 1), ("ac", 0, 1, 63, 0, 1),
        ("dc_refine", 0), ("ac", 0, 1, 63, 1, 0)]
GRAY = [{"h": 1, "v": 1}]
C420 = [{"h": 2, "v": 2}, {"h": 1, "v": 1}, {"h": 1, "v": 1}]


@pytest.mark.parametrize("w,h", [(16, 16), (24, 8), (17, 9), (8, 8)])
def test_gray_spectral_and_successive(w, h):
    rng = np.random.RandomState(21 + w + h)
    coefs = [rand_coefs(rng, (h + 7) // 8, (w + 7) // 8)]
    build_and_compare(coefs, GRAY, w, h, SPECTRAL)
    build_and_compare(coefs, GRAY, w, h, SUCC)


def test_color_420_spectral_and_successive():
    rng = np.random.RandomState(7)
    w = h = 32
    coefs = [rand_coefs(rng, 4, 4), rand_coefs(rng, 2, 2),
             rand_coefs(rng, 2, 2)]
    scans3 = [("dc_first", 0),
              ("ac", 0, 1, 20, 0, 0), ("ac", 1, 1, 63, 0, 0),
              ("ac", 2, 1, 63, 0, 0), ("ac", 0, 21, 63, 0, 0)]
    build_and_compare(coefs, C420, w, h, scans3)
    succ3 = [("dc_first", 1),
             ("ac", 0, 1, 20, 0, 1), ("ac", 1, 1, 63, 0, 1),
             ("ac", 2, 1, 63, 0, 1), ("ac", 0, 21, 63, 0, 1),
             ("dc_refine", 0),
             ("ac", 0, 1, 20, 1, 0), ("ac", 0, 21, 63, 1, 0),
             ("ac", 1, 1, 63, 1, 0), ("ac", 2, 1, 63, 1, 0)]
    build_and_compare(coefs, C420, w, h, succ3)


def test_color_420_odd_size_true_vs_padded_grid():
    """Odd 4:2:0 sizes make the luma TRUE block grid smaller than the
    padded MCU grid: non-interleaved AC scans cover only the true
    grid, interleaved baseline covers the padding too — so padding
    blocks carry zero AC (as any real encoder emits) and the two
    streams must still agree."""
    rng = np.random.RandomState(13)
    w, h = 35, 19
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    luma = rand_coefs(rng, mcuy * 2, mcux * 2)
    nbx, nby = (w + 7) // 8, (h + 7) // 8
    luma[nby:, :, :, :] = 0
    luma[:, nbx:, :, :] = 0
    # padding blocks may keep DC (interleaved scans cover them)
    luma[..., 0, 0] = rand_coefs(rng, mcuy * 2, mcux * 2)[..., 0, 0]
    coefs = [luma, rand_coefs(rng, mcuy, mcux),
             rand_coefs(rng, mcuy, mcux)]
    scans3 = [("dc_first", 0), ("ac", 0, 1, 63, 0, 0),
              ("ac", 1, 1, 63, 0, 0), ("ac", 2, 1, 63, 0, 0)]
    build_and_compare(coefs, C420, w, h, scans3)


def test_gray_progressive_restart_intervals():
    """RSTn inside progressive scans reset DC predictors AND EOB
    runs; sparse coefficients make EOB runs span restart boundaries
    in the unrestarted form, so a missed reset diverges."""
    rng = np.random.RandomState(17)
    coefs = [rand_coefs(rng, 4, 4, density=0.05)]
    build_and_compare(coefs, GRAY, 32, 32, SPECTRAL, ri=3)
    build_and_compare(coefs, GRAY, 32, 32, SUCC, ri=5)
