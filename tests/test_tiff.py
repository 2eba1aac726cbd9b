"""TIFF 6.0 baseline decoder (datapipe/tiff.py): roundtrips across the
two independent spec transcriptions, spec-edge rejections, and the
mandatory hostile-bytes soak for a new untrusted-bytes parser."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonextract_spark.datapipe import tiff as T

pytestmark = []

_RNG = np.random.default_rng(42)
_RGB = _RNG.integers(0, 256, (13, 9, 3), dtype=np.uint8)
_GRAY = _RNG.integers(0, 256, (7, 5), dtype=np.uint8)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 32773])
@pytest.mark.parametrize("rps", [None, 4, 1])
def test_rgb_roundtrip(bo, comp, rps):
    data = T.encode_tiff(_RGB, byte_order=bo, compression=comp,
                         rows_per_strip=rps)
    assert np.array_equal(T.parse_tiff(data), _RGB)


def test_gray_black_is_zero():
    out = T.parse_tiff(T.encode_tiff(_GRAY, photometric=1))
    assert np.array_equal(out, np.repeat(_GRAY[..., None], 3, 2))


def test_gray_white_is_zero_inverts():
    out = T.parse_tiff(T.encode_tiff(_GRAY, photometric=0,
                                     compression=32773))
    assert np.array_equal(out, np.repeat((255 - _GRAY)[..., None], 3, 2))


def test_palette():
    pal = _RNG.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = _RNG.integers(0, 256, (6, 8), dtype=np.uint8)
    out = T.parse_tiff(T.encode_tiff(idx, photometric=3, palette=pal))
    # encoder writes 257*v shorts; decoder takes the high byte back
    assert np.array_equal(out, pal[idx])


def test_packbits_roundtrip_independent():
    for _ in range(60):
        row = bytes(_RNG.integers(0, 4, int(_RNG.integers(0, 400)))
                    .astype(np.uint8))
        assert T._unpackbits(T._packbits(row), len(row)) == row


def test_rejections():
    base = T.encode_tiff(_RGB)
    lzw = base.replace(struct.pack("<HHI", 259, 3, 1)
                       + struct.pack("<H", 1) + b"\x00\x00",
                       struct.pack("<HHI", 259, 3, 1)
                       + struct.pack("<H", 5) + b"\x00\x00")
    assert lzw != base
    cases = [
        (b"", "too short"),
        (b"XX" + base[2:], "byte order"),
        (b"II" + struct.pack("<H", 43) + base[4:], "magic"),
        (lzw, "LZW unsupported"),
        (base[:40], "truncated IFD"),
    ]
    for data, why in cases:
        with pytest.raises(ValueError):
            T.parse_tiff(data)


def test_pixel_cap(monkeypatch):
    monkeypatch.setattr(T, "TIFF_MAX_PIXELS", 64)
    with pytest.raises(ValueError):
        T.parse_tiff(T.encode_tiff(_RGB))


def test_sixteen_bit_rejected():
    # rewrite BitsPerSample 8,8,8 -> 16,16,16 (ext blob, 3 SHORTs)
    base = T.encode_tiff(_RGB)
    bad = base.replace(struct.pack("<HHH", 8, 8, 8),
                       struct.pack("<HHH", 16, 16, 16))
    assert bad != base
    with pytest.raises(ValueError):
        T.parse_tiff(bad)


@pytest.mark.spark
def test_tiff_through_decode_features(spark):
    from jsonextract_spark.datapipe.multimodal import decode_features

    img = np.broadcast_to(np.array([10, 20, 40], np.uint8),
                          (4, 8, 3)).astype(np.uint8)
    rows = [(0, "image/tiff", bytearray(T.encode_tiff(img)), 8, 4, 1),
            (1, "image/tiff", bytearray(b"II*\x00garbage"), 0, 0, 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary,"
              " width int, height int, n_frames int")
    out = {r.doc_id: r for r in
           decode_features(df, decode_mode="real").collect()}
    assert out[0].ok and abs(out[0].feat[24] * 255 - 10) < 1e-4
    assert out[0].feat[31] == 2.0          # aspect 8/4
    assert not out[1].ok and "tiff" in out[1].err


# -- hostile-bytes soak ----------------------------------------------------------

_OPS = st.lists(
    st.tuples(st.sampled_from(["truncate", "flip", "insert", "splice",
                               "double"]),
              st.integers(0, 1 << 16), st.integers(0, 255)),
    min_size=1, max_size=6)


def _mutate(data: bytes, ops) -> bytes:
    for kind, a, b in ops:
        if not data:
            break
        a %= len(data) + 1
        if kind == "truncate":
            data = data[:a]
        elif kind == "flip":
            if a < len(data):
                data = (data[:a] + bytes([data[a] ^ (b | 1)])
                        + data[a + 1:])
        elif kind == "insert":
            data = data[:a] + bytes([b]) * 3 + data[a:]
        elif kind == "splice":
            data = data[:a] + data[(a + b) % (len(data) + 1):]
        elif kind == "double":
            data = data[:a] + data[:a] + data[a:]
    return data


@settings(max_examples=200, deadline=None)
@given(bo=st.sampled_from(["<", ">"]), comp=st.sampled_from([1, 32773]),
       photo=st.sampled_from([0, 1, 2]), ops=_OPS)
def test_hostile_mutations(bo, comp, photo, ops):
    img = _RGB if photo == 2 else _GRAY
    data = _mutate(T.encode_tiff(img, byte_order=bo, photometric=photo,
                                 compression=comp, rows_per_strip=3),
                   ops)
    try:
        out = T.parse_tiff(data)
    except ValueError:
        return
    assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
    assert out.shape[0] * out.shape[1] <= T.TIFF_MAX_PIXELS


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=4096))
def test_arbitrary_bytes(data):
    try:
        T.parse_tiff(data)
    except ValueError:
        pass


def test_multipage_roundtrip():
    imgs = [_RNG.integers(0, 256, (5 + k, 4, 3), dtype=np.uint8)
            for k in range(4)]
    data = T.encode_tiff_pages(imgs, byte_order=">",
                               compression=32773, rows_per_strip=2)
    back = T.parse_tiff_frames(data)
    assert len(back) == 4
    for a, b in zip(back, imgs):
        assert np.array_equal(a, b)
    # parse_tiff is page one
    assert np.array_equal(T.parse_tiff(data), imgs[0])


def test_ifd_loop_hits_page_cap():
    """A next-IFD pointer looping back to the first IFD must stop at
    the page cap, not spin forever."""
    data = bytearray(T.encode_tiff(_GRAY, photometric=1))
    n = int.from_bytes(data[8:10], "little")
    ptr = 8 + 2 + 12 * n
    data[ptr:ptr + 4] = (8).to_bytes(4, "little")
    with pytest.raises(ValueError, match="page count cap"):
        T.parse_tiff_frames(bytes(data))


def test_multipage_pixel_budget():
    imgs = [np.zeros((8, 8, 3), np.uint8)] * 3
    with pytest.raises(ValueError, match="budget"):
        T.parse_tiff_frames(T.encode_tiff_pages(imgs), pixel_budget=100)


@pytest.mark.spark
def test_tiff_frame_sampling(spark):
    from jsonextract_spark.datapipe.multimodal import sample_frames

    pages = [np.broadcast_to(np.array([v, v, v], np.uint8),
                             (4, 4, 3)).astype(np.uint8)
             for v in (10, 60, 200)]
    rows = [(0, "image/tiff",
             bytearray(T.encode_tiff_pages(pages)), 4, 4, 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary,"
              " width int, height int, n_frames int")
    out = sample_frames(df, k=3, decode_mode="real").collect()
    assert [(r.sample_no, r.frame_idx, r.ok) for r in out] == \
        [(0, 0, True), (1, 1, True), (2, 2, True)]
    # frames come back as canonical P6 of each PAGE
    from jsonextract_spark.datapipe import codecs
    img0, _ = codecs.parse_ppm(bytes(out[0].frame))
    assert img0[0, 0, 0] == 10


def test_count_zero_entry_is_valueerror_not_indexerror():
    """r9 review finding: a count=0 IFD entry for a read tag must land
    in the err channel, not escape as IndexError."""
    base = T.encode_tiff(_RGB)
    # ImageWidth entry: tag 256, type LONG(4), count 1 -> count 0
    pat = struct.pack("<HHI", 256, 4, 1)
    bad = base.replace(pat, struct.pack("<HHI", 256, 4, 0), 1)
    assert bad != base
    with pytest.raises(ValueError):
        T.parse_tiff(bad)


def test_byte_bomb_cap_counts_samples(monkeypatch):
    """r9 review finding: the allocation is w*h*spp BYTES — a 16-sample
    image must hit the cap 16x earlier than an RGB one."""
    monkeypatch.setattr(T, "TIFF_MAX_PIXELS", 1 << 10)
    # craft a 16-spp image header by patching SamplesPerPixel and
    # BitsPerSample of a gray image whose w*h passes the pixel cap
    img = np.zeros((16, 16), np.uint8)          # 256 px < 1024 cap
    base = T.encode_tiff(img, photometric=1)
    bad = base.replace(struct.pack("<HHI", 277, 3, 1)
                       + struct.pack("<H", 1) + b"\x00\x00",
                       struct.pack("<HHI", 277, 3, 1)
                       + struct.pack("<H", 16) + b"\x00\x00", 1)
    bad = bad.replace(struct.pack("<HHI", 258, 3, 1)
                      + struct.pack("<H", 8) + b"\x00\x00",
                      struct.pack("<HHI", 258, 3, 1)
                      + struct.pack("<H", 8) + b"\x00\x00", 1)
    assert bad != base
    with pytest.raises(ValueError, match="cap"):
        T.parse_tiff(bad)
