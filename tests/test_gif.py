"""GIF codec correctness (r8): decoder vs the INDEPENDENT hash-dict
LZW test encoder, interlace/animation/transparency/disposal semantics,
allocation caps, and the hostile-payload family (written with the
parser, per the r7 lesson: IndexError/OverflowError escapes kill Spark
tasks — only ValueError may leave the decoder)."""

import random
import struct

import numpy as np
import pytest

from jsonextract_spark.datapipe import gif as gif_mod
from jsonextract_spark.datapipe.gif import encode_gif, parse_gif

PAL4 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                np.uint8)


def test_roundtrip_flat_and_random():
    rng = np.random.RandomState(7)
    f = np.full((5, 7), 2, np.uint8)
    out = parse_gif(encode_gif([f], PAL4))
    assert len(out) == 1 and out[0].shape == (5, 7, 3)
    assert (out[0] == [0, 0, 255]).all()

    f2 = rng.randint(0, 4, (33, 41)).astype(np.uint8)
    assert np.array_equal(parse_gif(encode_gif([f2], PAL4))[0],
                          PAL4[f2])


def test_roundtrip_256_colors_code_width_growth():
    """120x200 random 256-color frame drives the LZW code width to 12
    bits and forces dictionary-overflow CLEARs in the encoder."""
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    f = rng.randint(0, 256, (120, 200)).astype(np.uint8)
    assert np.array_equal(parse_gif(encode_gif([f], pal))[0], pal[f])


def test_interlace():
    rng = np.random.RandomState(3)
    for h in (1, 4, 8, 29):
        f = rng.randint(0, 4, (h, 17)).astype(np.uint8)
        assert np.array_equal(
            parse_gif(encode_gif([f], PAL4, interlace=True))[0],
            PAL4[f]), h


def test_animation_transparency_disposal():
    a = np.zeros((8, 8), np.uint8)
    b = np.full((8, 8), 3, np.uint8)
    b[:4] = 1
    # transparency: bottom half of frame 2 keeps frame 1's pixels
    fr = parse_gif(encode_gif([a, b], PAL4, transparent=3))
    assert len(fr) == 2
    assert (fr[0] == PAL4[0]).all()
    assert (fr[1][:4] == PAL4[1]).all() and (fr[1][4:] == PAL4[0]).all()
    # disposal 2: region restored to background before next frame
    fr = parse_gif(encode_gif([b, a], PAL4, transparent=3,
                              disposals=[2, 0]))
    assert (fr[1] == PAL4[0]).all()
    # disposal 3: canvas restored to pre-frame state
    fr = parse_gif(encode_gif([a, b, a], PAL4, transparent=3,
                              disposals=[0, 3, 0]))
    assert (fr[2] == PAL4[0]).all()


def test_alloc_caps():
    # canvas cap fires at the header, before any array exists
    hdr = (b"GIF89a" + struct.pack("<HH", 60000, 60000)
           + bytes([0, 0, 0]) + b"\x3B")
    with pytest.raises(ValueError, match="pixel cap"):
        parse_gif(hdr)
    # GIF bomb: tiny stream declaring frames until the cumulative cap
    old = gif_mod.GIF_MAX_TOTAL_PIXELS
    gif_mod.GIF_MAX_TOTAL_PIXELS = 100
    try:
        f = np.zeros((6, 6), np.uint8)
        bomb = encode_gif([f, f, f], PAL4)
        with pytest.raises(ValueError, match="cumulative"):
            parse_gif(bomb)
    finally:
        gif_mod.GIF_MAX_TOTAL_PIXELS = old


def test_hostile_payloads_err_not_crash():
    """Bit-flip and truncation fuzz: every failure must stay in the
    ValueError family (the multimodal per-row err channel)."""
    rng = random.Random(1)
    good = encode_gif([np.zeros((6, 6), np.uint8)], PAL4[:2])
    for _ in range(1500):
        b = bytearray(good)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            parse_gif(bytes(b))
        except ValueError:
            pass
    for cut in range(len(good)):
        with pytest.raises(ValueError):
            parse_gif(good[:cut])
    # targeted: LZW code out of range / index outside palette /
    # frame rect outside canvas
    with pytest.raises(ValueError, match="outside canvas"):
        bad = bytearray(good)
        pos = good.index(b"\x2C")
        bad[pos + 1:pos + 3] = struct.pack("<H", 100)   # fx=100 > w
        parse_gif(bytes(bad))
    with pytest.raises(ValueError, match="color table"):
        f = np.zeros((4, 4), np.uint8)
        f[0, 0] = 3     # literal 3 < clear(4) passes LZW, but the
        parse_gif(encode_gif([f], PAL4[:2]))   # palette has 2 entries


def test_spark_decode_and_frame_sampling(spark):
    """The distributed real path: decode_features + sample_frames over
    animated GIF payloads (mapInPandas, per-row err channel)."""
    import pandas as pd

    from jsonextract_spark.datapipe.multimodal import (MEDIA_SCHEMA,
                                                       decode_features,
                                                       sample_frames)

    pal = np.array([[100, 0, 0], [0, 0, 0]], np.uint8)
    frames = [np.zeros((4, 8), np.uint8)] * 3
    payload = encode_gif(frames, pal)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame({
                "doc_id": pdf["id"],
                "media_type": ["image/gif"] * (n - 1) + ["video/mp4"],
                "payload": [payload] * (n - 1) + [b"junk"],
                "width": 8, "height": 4, "n_frames": 3})

    media = spark.range(6).coalesce(1).mapInPandas(gen, MEDIA_SCHEMA)
    feats = decode_features(media, decode_mode="real").collect()
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id[0]["ok"] and not by_id[5]["ok"]
    assert abs(by_id[0]["feat"][24] * 255 - 100.0) < 1e-4   # mean_r

    sampled = sample_frames(media, k=2, decode_mode="real").collect()
    ok_rows = [r for r in sampled if r["ok"]]
    assert len(ok_rows) == 5 * 2
    from jsonextract_spark.datapipe import codecs
    expect = codecs.encode_ppm(
        np.broadcast_to(pal[0], (4, 8, 3)).astype(np.uint8))
    assert all(bytes(r["frame"]) == expect for r in ok_rows)
    assert {r["frame_idx"] for r in ok_rows} == {0, 1}   # (j*3)//2


def test_gif_bomb_full_canvas_accounting():
    """Review r8 (reproduced): a 626-byte stream declaring a
    4096x4096 canvas (inside the per-canvas cap) with 40 one-pixel
    frames allocated ~2 GB of canvas copies under rect-based
    accounting. The cumulative cap counts FULL-CANVAS pixels per
    frame, so this must reject as ValueError."""
    lzw = gif_mod._lzw_encode(b"\x00", 2)
    out = (bytearray(b"GIF89a") + struct.pack("<HH", 4096, 4096)
           + bytes([0x80, 0, 0]) + bytes([1, 2, 3, 4, 5, 6]))
    for _ in range(40):
        out += (b"\x2C" + struct.pack("<HHHH", 0, 0, 1, 1)
                + bytes([0, 2, len(lzw)]) + lzw + b"\x00")
    out += b"\x3B"
    with pytest.raises(ValueError, match="cumulative"):
        parse_gif(bytes(out))
