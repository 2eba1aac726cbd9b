"""WebP-lossless (VP8L) codec: roundtrips across every decode path
(transforms, cache, meta-Huffman, LZ77 plane codes), container
handling, and the hostile-bytes error contract. The encoder is an
independent from-spec transcription (own canonical-code construction
and forward transforms), so every roundtrip crosses two
implementations — the PNG/JPEG/GIF test discipline."""

import struct

import numpy as np
import pytest

from jsonextract_spark.datapipe import webp as W


def _rt(img, **kw):
    out = W.parse_webp(W.encode_webp_lossless(img, **kw))
    assert out.shape == img.shape
    assert (out == img).all()


def test_roundtrip_basic_and_edge_dims():
    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (1, 9), (9, 1), (5, 7), (16, 16), (3, 33)]:
        _rt(rng.randint(0, 256, (h, w, 3), np.uint8))


def test_roundtrip_transforms():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 9, 3), np.uint8)
    _rt(img, subtract_green=True)
    for mode in range(14):              # every predictor mode
        _rt(img, predictor_mode=mode)
    for deltas in [(0, 0, 0), (16, 240, 8), (255, 1, 128)]:
        _rt(img, color_deltas=deltas)
    _rt(img, subtract_green=True, predictor_mode=7)
    _rt(img, subtract_green=True, color_deltas=(9, 7, 5))


def test_roundtrip_palette_bundling_widths():
    """Color-indexing across every pixel-bundling width: 2 colors
    (8 px/byte), 3-4 (4 px/byte), 5-16 (2 px/byte), >16 (none)."""
    rng = np.random.RandomState(7)
    for ncol in (2, 3, 4, 9, 16, 17, 200):
        pal = rng.randint(0, 256, (ncol, 3), np.uint8)
        img = pal[rng.randint(0, ncol, (7, 10))]
        _rt(img, palette=True)


def test_roundtrip_cache_backrefs_meta():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (9, 11, 3), np.uint8)
    _rt(img, cache_bits=4)
    # repeated rows force LZ77 copies with distance = xsize — the 2D
    # plane-code path (offset {0,1} = code 1)
    rep = np.tile(rng.randint(0, 256, (1, 13, 3), np.uint8),
                  (6, 1, 1))
    _rt(rep, row_backrefs=True)
    _rt(rep, row_backrefs=True, cache_bits=3)
    # meta-Huffman: two code groups split at the image midline
    _rt(rng.randint(0, 256, (6, 16, 3), np.uint8), two_groups=True)


def test_vp8x_container_and_rejections():
    img = np.full((3, 3, 3), 77, np.uint8)
    simple = W.encode_webp_lossless(img)
    # re-wrap the VP8L chunk behind a VP8X header (extended container)
    vp8l = simple[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    ext = (b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l))
           + b"WEBP" + vp8x + vp8l)
    assert (W.parse_webp(ext) == img).all()

    with pytest.raises(ValueError, match="lossy"):
        W.parse_webp(b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                     + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="animated"):
        W.parse_webp(b"RIFF" + struct.pack("<I", 14) + b"WEBP"
                     + b"ANIM" + struct.pack("<I", 6) + b"\x00" * 6)
    with pytest.raises(ValueError, match="signature"):
        W.parse_webp(b"not a webp at all")
    with pytest.raises(ValueError, match="no VP8L"):
        W.parse_webp(b"RIFF" + struct.pack("<I", 4) + b"WEBP")


def test_pixel_cap_before_allocation():
    """A tiny header declaring a huge canvas must reject BEFORE any
    pixel allocation (the PNG/JPEG bomb discipline)."""
    bw = W._BitWriter()
    bw.put(0x2F, 8)
    bw.put((1 << 14) - 1, 14)          # 16384 x 16384 > 2^26 px
    bw.put((1 << 14) - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    payload = bw.bytes()
    data = (b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(ValueError, match="pixel cap"):
        W.parse_webp(data)


def test_incomplete_prefix_code_rejected():
    """Kraft-incomplete Huffman codes must fail loudly, not decode
    garbage (hostile-stream discipline)."""
    with pytest.raises(ValueError, match="prefix code"):
        W._Huff([3, 3, 0, 0])          # undersubscribed
    with pytest.raises(ValueError, match="prefix code"):
        W._Huff([1, 1, 1])             # oversubscribed
    with pytest.raises(ValueError, match="empty"):
        W._Huff([0, 0, 0])


def test_hostile_bytes_family():
    """Family-14 soak for the new untrusted-bytes surface: mutations
    of valid files must produce result-or-ValueError, never an
    executor-killing IndexError/struct.error/OverflowError."""
    import random

    rng = np.random.RandomState(11)
    rnd = random.Random(11)
    base = [
        W.encode_webp_lossless(
            rng.randint(0, 256, (6, 8, 3), np.uint8)),
        W.encode_webp_lossless(
            rng.randint(0, 256, (5, 5, 3), np.uint8),
            subtract_green=True, cache_bits=3),
        W.encode_webp_lossless(
            np.tile(rng.randint(0, 256, (1, 9, 3), np.uint8),
                    (5, 1, 1)), row_backrefs=True),
    ]
    n_err = n_ok = 0
    for trial in range(600):
        data = bytearray(rnd.choice(base))
        for _ in range(rnd.randint(1, 4)):
            op = rnd.random()
            if not data:
                break
            if op < 0.35:
                data = data[:rnd.randrange(len(data) + 1)]
            elif op < 0.8:
                i = rnd.randrange(len(data))
                data[i] ^= 1 << rnd.randrange(8)
            else:
                data += bytes([rnd.randrange(256)])
        try:
            W.parse_webp(bytes(data))
            n_ok += 1
        except ValueError:
            n_err += 1
    assert n_err + n_ok == 600 and n_err > 0


def test_distance_plane_table_spot_values():
    """Spot-pin the derived 120-entry plane-code table against the
    spec's literal listing (first rows + the x=8 tail)."""
    t = W._DIST_TABLE
    assert t[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                     (1, 2), (-1, 2)]
    assert t[22:24] == [(0, 4), (4, 0)]
    assert (8, 0) in t and (8, 7) == t[-1]
    assert len(t) == 120 and len(set(t)) == 120
    # no entry may map to a non-positive flat distance at any width
    assert all(y > 0 or x > 0 for x, y in t)
