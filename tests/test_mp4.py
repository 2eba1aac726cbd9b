"""MP4/ISO BMFF metadata parser (datapipe/mp4.py): builder↔parser
roundtrips across two independent spec transcriptions, spec-edge pins,
the Spark per-track surface, and the mandatory hostile-bytes soak (the
escape class keeps recurring: zlib r7, DHT r7, w32 r8 — every new
untrusted-bytes parser gets fuzzed the round it lands)."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jsonextract_spark.datapipe import mp4 as M

pytestmark = []


def _video(**kw):
    t = dict(kind="video", track_id=1, timescale=600, duration=1200,
             language="eng", codec="avc1", n_samples=48,
             keyframes=[1, 25], width=320, height=240)
    t.update(kw)
    return t


def _audio(**kw):
    t = dict(kind="audio", track_id=2, timescale=8000, duration=16000,
             language="und", codec="mp4a", n_samples=250, keyframes=None,
             channels=1, sample_rate=8000.0)
    t.update(kw)
    return t


def test_roundtrip_two_tracks():
    m = M.parse_mp4_meta(M.build_mp4(
        brand="mp42", movie_timescale=1000, movie_duration=2000,
        tracks=[_video(), _audio()]))
    assert (m["brand"], m["duration_sec"]) == ("mp42", 2.0)
    v, a = m["tracks"]
    assert (v["handler"], v["codec"], v["width"], v["height"]) == \
        ("vide", "avc1", 320.0, 240.0)
    assert (v["n_samples"], v["n_keyframes"], v["duration_sec"],
            v["language"]) == (48, 2, 2.0, "eng")
    assert (a["handler"], a["codec"], a["channels"],
            a["sample_rate"]) == ("soun", "mp4a", 1, 8000.0)
    # no stss box ⇒ every sample is a sync sample (spec 8.6.2)
    assert a["n_keyframes"] == a["n_samples"] == 250


def test_wide_largesize_box():
    m = M.parse_mp4_meta(M.build_mp4(movie_duration=3000,
                                     tracks=[_video()], wide=True))
    assert m["duration_sec"] == 3.0 and len(m["tracks"]) == 1


def test_size_zero_box_extends_to_end():
    data = M.build_mp4(movie_duration=1000, tracks=[])
    # rewrite the trailing mdat's size field to 0 (= to end of file)
    assert data.endswith(M._box(b"mdat", b""))
    data = data[:-8] + struct.pack(">I", 0) + b"mdat"
    assert M.parse_mp4_meta(data)["duration_sec"] == 1.0


def test_rejects():
    for bad, why in [
        (b"", "too short"),
        (b"\x00" * 7, "too short"),
        (struct.pack(">I", 4) + b"ftyp", "size<8"),
        (struct.pack(">I", 100) + b"ftyp", "overruns"),
        (M.build_mp4(tracks=[])[:-9], "truncated tail"),
        (M._box(b"ftyp", b"isom\x00\x00\x00\x00"), "no moov"),
        (M._box(b"moov", M._full(b"mvhd", 0, struct.pack(
            ">IIII", 0, 0, 0, 0) + b"\x00" * 80)), "zero timescale"),
    ]:
        with pytest.raises(ValueError):
            M.parse_mp4_meta(bad)


def test_stsz_stts_disagreement_rejected():
    good = M.build_mp4(movie_duration=1, tracks=[_video(n_samples=48)])
    # corrupt the stts count (48 -> 49) while stsz still says 48
    pat = M._full(b"stts", 0, struct.pack(">III", 1, 48, 1))
    bad = good.replace(pat, M._full(b"stts", 0,
                                    struct.pack(">III", 1, 49, 1)))
    assert bad != good
    with pytest.raises(ValueError):
        M.parse_mp4_meta(bad)


def test_box_count_cap(monkeypatch):
    monkeypatch.setattr(M, "MP4_MAX_BOXES", 8)
    data = M.build_mp4(movie_duration=1, tracks=[_video(), _audio()])
    with pytest.raises(ValueError):
        M.parse_mp4_meta(data)


def test_language_packing():
    assert M._lang_str(M._lang_pack("deu")) == "deu"
    assert M._lang_str(0) == "und"           # out-of-range chars
    assert M._lang_str(0x7FFF) == "und"      # 0x7f7f7f-ish garbage


@pytest.mark.spark
def test_extract_mp4_meta_spark(spark):
    rows = [(0, M.build_mp4(movie_duration=1000,
                            tracks=[_video(), _audio()])),
            (1, b"not an mp4 at all"),
            (2, M.build_mp4(movie_duration=500, tracks=[]))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = M.extract_mp4_meta(df).orderBy("doc_id", "track_id").collect()
    assert [(r.doc_id, r.track_id, r.ok) for r in out] == \
        [(0, 1, True), (0, 2, True), (1, -1, False), (2, 0, True)]
    assert out[0].codec == "avc1" and out[0].width == 320.0
    assert out[1].sample_rate == 8000.0
    assert "mp4" in out[2].err
    assert out[3].movie_duration_sec == 0.5


# -- hostile-bytes soak ----------------------------------------------------------

_ALLOWED = ValueError

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
@given(n_tracks=st.integers(0, 3), wide=st.booleans(), ops=_OPS)
def test_hostile_mutations(n_tracks, wide, ops):
    tracks = [_video(track_id=i + 1) if i % 2 == 0
              else _audio(track_id=i + 1) for i in range(n_tracks)]
    data = _mutate(M.build_mp4(movie_duration=1000, tracks=tracks,
                               wide=wide), ops)
    try:
        m = M.parse_mp4_meta(data)
    except _ALLOWED:
        return
    assert m["timescale"] > 0
    assert len(m["tracks"]) <= M.MP4_MAX_TRACKS
    for t in m["tracks"]:
        for k in ("n_samples", "n_keyframes"):
            assert t[k] is None or t[k] >= 0


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=4096))
def test_arbitrary_bytes(data):
    try:
        M.parse_mp4_meta(data)
    except _ALLOWED:
        pass


def test_truncated_tkhd_never_reads_sibling_bytes():
    """r9 review finding (reproduced pre-fix): a tkhd box too short
    for its version layout must raise, not read width/height out of
    the NEXT box's bytes and report them ok=true."""
    stub_tkhd = M._full(b"tkhd", 0, struct.pack(">III", 0, 0, 7))
    filler = M._box(b"free", b"\xab" * 120)
    mdia = M._box(b"mdia", M._full(b"mdhd", 0, struct.pack(
        ">IIIIHH", 0, 0, 600, 600, M._lang_pack("und"), 0)))
    trak = M._box(b"trak", stub_tkhd + filler + mdia)
    moov = M._box(b"moov", M._full(b"mvhd", 0, struct.pack(
        ">IIII", 0, 0, 1000, 1000) + b"\x00" * 80) + trak)
    data = M._box(b"ftyp", b"isom\x00\x00\x00\x00isom") + moov
    with pytest.raises(ValueError, match="too short"):
        M.parse_mp4_meta(data)


def test_truncated_mvhd_rejected():
    moov = M._box(b"moov", M._full(b"mvhd", 0, struct.pack(">II", 0, 0)))
    with pytest.raises(ValueError, match="too short"):
        M.parse_mp4_meta(M._box(b"ftyp", b"isomxxxx") + moov)
