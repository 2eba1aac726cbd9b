"""TIFF 6.0 baseline decoder — dependency-free, from the public
Adobe TIFF 6.0 specification.

Scope (the baseline a crawler meets in scans/faxes/stock dumps):
both byte orders (II little / MM big), the full IFD chain (multi-page
fax/scan bundles — ``parse_tiff_frames``; ``parse_tiff`` is page one),
strip-organized 8-bit images, Compression 1 (none) and 32773
(PackBits), and
PhotometricInterpretation 0/1 (grayscale, with WhiteIsZero inversion),
2 (RGB — extra samples beyond the first three are dropped), and
3 (palette via the 16-bit ColorMap, high byte taken, per spec the
canonical 8-bit reduction). Tiles, 16-bit samples, planar
configuration 2, and LZW/JPEG/Deflate compressions reject as
ValueError with the reason — the per-row err channel, like every codec
here (multimodal.py catches exactly (NotImplementedError, ValueError)).

Bomb discipline (the repo-wide untrusted-bytes contract): pixel count
capped BEFORE any allocation; every IFD value, strip offset and
byte count bounds-checked against the payload; PackBits expansion
bounded by the strip's declared pixel size; entry counts validated
against the format's own field sizes.

The encoder below is the TEST/INTEROP side: an independent
transcription of the same spec (its own IFD writer and PackBits
packer), so roundtrips cross two implementations — the same
discipline as the PNG/JPEG/GIF/WebP/MP4 test builders.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAX_PIXELS = 1 << 26

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _rd(data: bytes, off: int, n: int, bo: str) -> int:
    if off < 0 or off + n > len(data):
        raise ValueError("tiff: truncated field")
    return int.from_bytes(data[off:off + n],
                          "little" if bo == "<" else "big")


def _ifd_values(data: bytes, bo: str, typ: int, count: int,
                val_off: int) -> list[int]:
    """Integer values of one IFD entry (BYTE/SHORT/LONG; RATIONAL and
    ASCII are skipped by callers)."""
    if typ not in (1, 3, 4):
        raise ValueError(f"tiff: unsupported field type {typ}")
    size = _TYPE_SIZE[typ]
    total = size * count
    # 2^20 values ≈ 28 MB of Python ints — far above any legal use of
    # the tags we read (ColorMap is 768; strip arrays are ≤ rows) but
    # low enough that a hostile count can't balloon memory before the
    # bounds checks below reject it
    if count > (1 << 20):
        raise ValueError("tiff: absurd IFD count")
    base = val_off if total <= 4 else _rd(data, val_off, 4, bo)
    return [_rd(data, base + i * size, size, bo) for i in range(count)]


def _unpackbits(src: bytes, expected: int) -> bytes:
    """PackBits (spec section 9): literal runs and replicate runs;
    output bounded by the strip's declared size."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        c = src[i]
        i += 1
        if c < 128:                      # literal run of c+1 bytes
            j = i + c + 1
            if j > n:
                raise ValueError("tiff: packbits literal overrun")
            out += src[i:j]
            i = j
        elif c > 128:                    # replicate next byte 257-c
            if i >= n:
                raise ValueError("tiff: packbits replicate overrun")
            out += bytes([src[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: packbits underrun")
    return bytes(out[:expected])


TIFF_MAX_PAGES = 1024


def _header(data: bytes) -> tuple[str, int]:
    if len(data) < 8:
        raise ValueError("tiff: too short")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    if _rd(data, 2, 2, bo) != 42:
        raise ValueError("tiff: bad magic")
    return bo, _rd(data, 4, 4, bo)


def parse_tiff(data: bytes) -> np.ndarray:
    """First page of a TIFF payload -> (h, w, 3) uint8. ValueError on
    anything outside the supported baseline or malformed."""
    bo, ifd = _header(data)
    img, _next = _parse_ifd(data, bo, ifd)
    return img


def parse_tiff_frames(data: bytes,
                      pixel_budget: int = TIFF_MAX_PIXELS
                      ) -> list[np.ndarray]:
    """Every page of a multi-page TIFF (the IFD chain — fax bundles,
    scanned documents). The page cap and a TOTAL pixel budget across
    pages guard the chain the same way the GIF animation path caps
    full-canvas pixels per frame; an IFD loop (next pointer revisiting
    an earlier offset) is caught by the page cap."""
    bo, ifd = _header(data)
    frames: list[np.ndarray] = []
    left = pixel_budget
    while ifd:
        if len(frames) >= TIFF_MAX_PAGES:
            raise ValueError("tiff: page count cap exceeded")
        img, ifd = _parse_ifd(data, bo, ifd)
        left -= img.shape[0] * img.shape[1]
        if left < 0:
            raise ValueError("tiff: multi-page pixel budget exceeded")
        frames.append(img)
    return frames


def _parse_ifd(data: bytes, bo: str,
               ifd: int) -> tuple[np.ndarray, int]:
    """One IFD -> ((h, w, 3) uint8, next-IFD offset or 0)."""
    n_entries = _rd(data, ifd, 2, bo)
    if n_entries == 0 or n_entries > 4096:
        raise ValueError("tiff: bad IFD entry count")

    tags: dict[int, list[int]] = {}
    want = {256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 320, 322}
    for i in range(n_entries):
        e = ifd + 2 + 12 * i
        tag = _rd(data, e, 2, bo)
        typ = _rd(data, e + 2, 2, bo)
        count = _rd(data, e + 4, 4, bo)
        if tag in want:
            tags[tag] = _ifd_values(data, bo, typ, count, e + 8)
    next_ifd = _rd(data, ifd + 2 + 12 * n_entries, 4, bo)

    def one(tag, default=None):
        """Single-valued tag; an empty value list (count=0 entry) is
        malformed, never an IndexError (the err-channel contract)."""
        vals = tags.get(tag)
        if vals is None:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        if not vals:
            raise ValueError(f"tiff: empty value list for tag {tag}")
        return vals[0]

    if 322 in tags:
        raise ValueError("tiff: tiled images unsupported")
    if one(284, 1) != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    comp = one(259, 1)
    if comp not in (1, 32773):
        raise ValueError(f"tiff: compression {comp} unsupported "
                         "(baseline: none/PackBits)")
    w = one(256)
    h = one(257)
    photo = one(262)
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("tiff: missing strip offsets/byte counts")
    spp = one(277, 1)
    if w <= 0 or h <= 0 or spp <= 0 or spp > 16:
        raise ValueError("tiff: bad dimensions")
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise ValueError("tiff: only 8-bit samples supported")
    # the allocation below is w*h*spp BYTES — bound that, not just the
    # pixel count (spp up to 16 would under-count the cap 16x)
    if w * h > TIFF_MAX_PIXELS or w * h * spp > 3 * TIFF_MAX_PIXELS:
        raise ValueError("tiff: pixel count exceeds cap")
    if len(offsets) != len(counts) or not offsets:
        raise ValueError("tiff: strip offsets/counts mismatch")

    rps = one(278, h)
    if rps <= 0:
        rps = h
    n_strips = (h + rps - 1) // rps
    if n_strips != len(offsets):
        raise ValueError("tiff: strip count disagrees with rows")

    raw = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - s * rps)
        expected = rows * w * spp
        if off < 0 or cnt < 0 or off + cnt > len(data):
            raise ValueError("tiff: strip outside payload")
        chunk = data[off:off + cnt]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("tiff: short strip")
            raw += chunk[:expected]
        else:
            raw += _unpackbits(chunk, expected)

    px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if photo in (0, 1):
        g = px[..., 0]
        if photo == 0:                   # WhiteIsZero
            g = 255 - g
        return np.repeat(g[..., None], 3, axis=2).copy(), next_ifd
    if photo == 2:
        if spp < 3:
            raise ValueError("tiff: RGB needs >=3 samples")
        return px[..., :3].copy(), next_ifd
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("tiff: palette image without full ColorMap")
        if any(v > 0xFFFF for v in cmap[:3 * 256]):
            # a LONG-typed ColorMap can exceed SHORT range; numpy>=2.0
            # raises OverflowError on the uint16 cast (escaping the
            # err channel) where 1.x silently wrapped — reject instead
            raise ValueError("tiff: ColorMap value out of SHORT range")
        lut = (np.array(cmap[:3 * 256], dtype=np.uint16)
               .reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[px[..., 0]].copy(), next_ifd
    raise ValueError(f"tiff: photometric {photo} unsupported")


# -- encoder (test/interop side: independent spec transcription) ---------------

def _packbits(row: bytes) -> bytes:
    """Independent PackBits packer: greedy replicate runs >=3, literal
    otherwise (the spec's recommended strategy)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 2 < n and row[i] == row[i + 1] == row[i + 2])):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def encode_tiff(img: np.ndarray, *, byte_order: str = "<",
                photometric: int = 2, compression: int = 1,
                rows_per_strip: int | None = None,
                palette: np.ndarray | None = None) -> bytes:
    """(h, w, 3) uint8 (or (h, w) for gray/palette index) -> TIFF
    bytes. photometric 0/1 take a gray plane, 2 takes RGB, 3 takes an
    index plane + ``palette`` of shape (256, 3)."""
    return encode_tiff_pages([img], byte_order=byte_order,
                             photometric=photometric,
                             compression=compression,
                             rows_per_strip=rows_per_strip,
                             palette=palette)


def encode_tiff_pages(imgs: list, *, byte_order: str = "<",
                      photometric: int = 2, compression: int = 1,
                      rows_per_strip: int | None = None,
                      palette: np.ndarray | None = None) -> bytes:
    """Multi-page TIFF: one IFD-chain entry per image, pages laid out
    sequentially ([IFD, ext, strips] each), every next-IFD pointer
    computed from the two-pass page layout — never patched."""
    bo = byte_order
    if not imgs:
        raise ValueError("encode_tiff_pages: no pages")
    out = bytearray((b"II" if bo == "<" else b"MM")
                    + struct.pack(bo + "H", 42)
                    + struct.pack(bo + "I", 8))
    pos = 8
    for k, img in enumerate(imgs):
        seg = _encode_page(img, bo=bo, photometric=photometric,
                           compression=compression,
                           rows_per_strip=rows_per_strip,
                           palette=palette, ifd_off=pos,
                           last=(k == len(imgs) - 1))
        out += seg
        pos += len(seg)
    return bytes(out)


def _encode_page(img: np.ndarray, *, bo: str, photometric: int,
                 compression: int, rows_per_strip: int | None,
                 palette: np.ndarray | None, ifd_off: int,
                 last: bool) -> bytes:
    h, w = img.shape[:2]
    if photometric == 2:
        plane = img.reshape(h, w * 3).astype(np.uint8)
        spp = 3
    else:
        plane = img.reshape(h, w).astype(np.uint8)
        spp = 1
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        s = plane[y0:y0 + rps].tobytes()
        strips.append(_packbits(s) if compression == 32773 else s)

    def pk(fmt, *v):
        return struct.pack(bo + fmt, *v)

    # two-pass layout: sizes decide the ext/data offsets first, then
    # every entry (including strip offsets) is emitted with its real
    # value — no post-hoc patching
    def specs(strip_offs):
        out = [
            (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp),
            (259, 3, [compression]), (262, 3, [photometric]),
            (273, 4, strip_offs), (277, 3, [spp]), (278, 4, [rps]),
            (279, 4, [len(s) for s in strips]),
        ]
        if photometric == 3:
            if palette is None:
                raise ValueError("palette required for photometric 3")
            cmap = palette.astype(np.uint16).T.reshape(-1) * 257
            out.append((320, 3, [int(v) for v in cmap]))
        return sorted(out)

    probe = specs([0] * len(strips))
    ifd_size = 2 + 12 * len(probe) + 4
    ext_size = sum(_TYPE_SIZE[typ] * len(vals)
                   for _, typ, vals in probe
                   if _TYPE_SIZE[typ] * len(vals) > 4)
    data_off = ifd_off + ifd_size + ext_size
    strip_offs, pos = [], data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    next_ifd = 0 if last else pos          # next page starts right after

    ext = bytearray()
    ext_base = ifd_off + ifd_size
    body = bytearray()
    final = specs(strip_offs)
    body += pk("H", len(final))
    for tag, typ, vals in final:
        code = {1: "B", 3: "H", 4: "I"}[typ]
        blob = b"".join(pk(code, v) for v in vals)
        body += pk("H", tag) + pk("H", typ) + pk("I", len(vals))
        if len(blob) <= 4:
            body += blob + b"\x00" * (4 - len(blob))
        else:
            body += pk("I", ext_base + len(ext))
            ext += blob
    body += pk("I", next_ifd)
    return bytes(body) + bytes(ext) + b"".join(strips)
