"""BMP/ICO codec correctness (r8): decoder vs independent spec-side
encoders, depth/orientation coverage, caps, hostile family (only
ValueError may escape — the multimodal err-channel contract)."""

import random
import struct

import numpy as np
import pytest

from jsonextract_spark.datapipe import codecs as C


def test_bmp_roundtrip_24bit_both_orientations():
    rng = np.random.RandomState(5)
    for shape in ((13, 21, 3), (1, 1, 3), (7, 32, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert np.array_equal(C.parse_bmp(C.encode_bmp(img)), img)
        assert np.array_equal(
            C.parse_bmp(C.encode_bmp(img, topdown=True)), img)


def test_bmp_palette_depths():
    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (17, 3)).astype(np.uint8)
    idx = rng.randint(0, 17, (9, 14)).astype(np.uint8)
    assert np.array_equal(C.parse_bmp(C.encode_bmp_pal8(idx, pal)),
                          pal[idx])


def test_ico_classic_and_png_entries():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    assert np.array_equal(C.parse_ico(C.encode_ico_bmp(img)), img)
    # PNG-compressed entry (the modern favicon form)
    png = C.encode_png(img)
    entry = (bytes([16, 16, 0, 0])
             + struct.pack("<HHII", 1, 32, len(png), 22))
    ico = b"\x00\x00\x01\x00\x01\x00" + entry + png
    assert np.array_equal(C.parse_ico(ico), img)
    # multiple entries: the LARGEST wins
    small = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    sbody = C.encode_ico_bmp(small)[22:]       # strip dir, keep DIB
    lbody = C.encode_ico_bmp(img)[22:]
    off1 = 6 + 32
    e1 = (bytes([4, 4, 0, 0])
          + struct.pack("<HHII", 1, 32, len(sbody), off1))
    e2 = (bytes([16, 16, 0, 0])
          + struct.pack("<HHII", 1, 32, len(lbody), off1 + len(sbody)))
    multi = b"\x00\x00\x01\x00\x02\x00" + e1 + e2 + sbody + lbody
    assert np.array_equal(C.parse_ico(multi), img)


def test_bmp_caps_and_hostile():
    # pixel cap fires before allocation
    dib = struct.pack("<IiihhIIiiII", 40, 60000, 60000, 1, 24, 0, 0,
                      0, 0, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
    with pytest.raises(ValueError, match="pixel cap"):
        C.parse_bmp(hdr + dib)
    rng = random.Random(1)
    img = np.random.RandomState(1).randint(
        0, 256, (8, 8, 3)).astype(np.uint8)
    for good, fn in ((C.encode_bmp(img), C.parse_bmp),
                     (C.encode_ico_bmp(img), C.parse_ico)):
        for _ in range(1200):
            b = bytearray(good)
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                fn(bytes(b))
            except ValueError:
                pass
        for cut in range(len(good)):
            with pytest.raises(ValueError):
                fn(good[:cut])


def test_feature_dispatch():
    img = np.full((8, 8, 3), 100, np.uint8)
    for payload, mtype in ((C.encode_bmp(img), "image/bmp"),
                           (C.encode_ico_bmp(img), "image/x-icon")):
        f = C.real_decode_features(payload, mtype)
        assert abs(float(f[24]) * 255 - 100.0) < 1e-4
        assert float(f[27]) == 0.0


def test_bmp_truecolor_optional_color_table():
    """Review r8 (reproduced): a spec-legal 24-bit BMP with
    biClrUsed=16 carries a 64-byte optional color table before the
    pixel data; ignoring it decoded shifted garbage with ok=True."""
    img = np.random.RandomState(3).randint(
        0, 256, (5, 6, 3)).astype(np.uint8)
    h, w = img.shape[:2]
    stride = ((w * 24 + 31) // 32) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 3] = img[:, :, ::-1].reshape(h, w * 3)
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, stride * h,
                      0, 0, 16, 0)
    off = 14 + 40 + 64
    hdr = b"BM" + struct.pack("<IHHI", off + stride * h, 0, 0, off)
    data = hdr + dib + bytes(64) + bytes(rows[::-1].tobytes())
    assert np.array_equal(C.parse_bmp(data), img)
