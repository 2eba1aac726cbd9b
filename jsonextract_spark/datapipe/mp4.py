"""MP4 / ISO BMFF container metadata (ISO/IEC 14496-12, public spec).

A crawl meets video as opaque payloads. Decoding H.264/H.265/AV1
*frames* needs ffmpeg-class codecs this container doesn't ship (those
paths stay NotImplementedError in multimodal.py) — but the container
METADATA is pure public-spec structure, and it's what a training-data
pipeline actually filters on (duration, resolution, codec fourcc,
keyframe density, language, sample counts) before ever spending decode
cycles. This module parses it for real:

* box walk: 32-bit and 64-bit (``largesize``) boxes, size-0
  extends-to-end boxes, strict bounds inside the parent, a box-count
  cap enforced BEFORE trusting any length field (nesting depth is
  structurally bounded — the walk is hard-coded moov→trak→mdia→minf→
  stbl, never recursive over arbitrary containers)
* ``ftyp`` major brand; ``mvhd`` movie timescale/duration (v0 + v1)
* per ``trak``: ``tkhd`` (track id, presentation WxH as 16.16 fixed,
  v0 + v1), ``mdhd`` (media timescale/duration, packed ISO-639
  language), ``hdlr`` (handler fourcc), ``stsd`` (codec fourcc plus
  the visual WxH / audio channels+rate sample-entry fields),
  ``stsz``/``stts`` (sample counts, cross-checked when both present),
  ``stss`` (sync-sample table = keyframes; absent ⇒ every sample is a
  sync sample, per spec 8.6.2)

Err-channel contract (the discipline every untrusted-bytes parser in
this repo follows): ValueError only — multimodal.py catches exactly
``(NotImplementedError, ValueError)``; an IndexError/struct.error
would kill the Spark task. All reads go through bounds-checked
helpers; entry counts validate against the box's own byte size before
any loop.

The builder below is the TEST/INTEROP side: an independent
transcription of the same spec composing boxes from its own writer, so
roundtrip tests cross two implementations — the same discipline as the
PNG/JPEG/GIF/WebP test encoders.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

MP4_MAX_BOXES = 65536
MP4_MAX_TRACKS = 256


def _need(data: bytes, off: int, n: int) -> None:
    if off < 0 or off + n > len(data):
        raise ValueError("mp4: truncated field")


def _u16(data: bytes, off: int) -> int:
    _need(data, off, 2)
    return int.from_bytes(data[off:off + 2], "big")


def _u32(data: bytes, off: int) -> int:
    _need(data, off, 4)
    return int.from_bytes(data[off:off + 4], "big")


def _u64(data: bytes, off: int) -> int:
    _need(data, off, 8)
    return int.from_bytes(data[off:off + 8], "big")


def _boxes(data: bytes, start: int, end: int,
           budget: list) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in
    [start, end); every box must lie entirely inside its parent."""
    off = start
    while off < end:
        if end - off < 8:
            raise ValueError("mp4: trailing garbage shorter than a box")
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("mp4: box count cap exceeded")
        size = _u32(data, off)
        typ = data[off + 4:off + 8]
        hdr = 8
        if size == 1:
            size = _u64(data, off + 8)
            hdr = 16
            if size < 16:
                raise ValueError("mp4: bad largesize")
        elif size == 0:
            size = end - off
        elif size < 8:
            raise ValueError("mp4: bad box size")
        if off + size > end or size < hdr:
            raise ValueError("mp4: box overruns parent")
        yield typ, off + hdr, off + size
        off += size


def _fullbox(data: bytes, s: int, e: int) -> tuple[int, int]:
    """(version, body_start) of a full box; flags are skipped."""
    if e - s < 4:
        raise ValueError("mp4: full box too short")
    return data[s], s + 4


def _fits(end_needed: int, e: int) -> None:
    """Fixed-offset fields must lie inside THEIR OWN box — checking
    against the whole payload would let a truncated box silently read
    sibling-box bytes as metadata."""
    if end_needed > e:
        raise ValueError("mp4: box too short for its version layout")


def _lang_str(v: int) -> str:
    """Packed ISO-639-2/T: 1 pad bit + three 5-bit chars (+0x60)."""
    chars = [((v >> sh) & 0x1F) + 0x60 for sh in (10, 5, 0)]
    if all(0x61 <= c <= 0x7A for c in chars):
        return bytes(chars).decode("ascii")
    return "und"


def _parse_mvhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    version, b = _fullbox(data, s, e)
    if version == 1:
        _fits(b + 28, e)
        timescale, duration = _u32(data, b + 16), _u64(data, b + 20)
    elif version == 0:
        _fits(b + 16, e)
        timescale, duration = _u32(data, b + 8), _u32(data, b + 12)
    else:
        raise ValueError("mp4: bad mvhd version")
    if timescale <= 0:
        raise ValueError("mp4: zero mvhd timescale")
    return timescale, duration


def _parse_tkhd(data: bytes, s: int, e: int) -> tuple[int, float, float]:
    version, b = _fullbox(data, s, e)
    if version == 1:
        track_id = _u32(data, b + 16)
        w_off = b + 84
    elif version == 0:
        track_id = _u32(data, b + 8)
        w_off = b + 72
    else:
        raise ValueError("mp4: bad tkhd version")
    _fits(w_off + 8, e)
    width = _u32(data, w_off) / 65536.0
    height = _u32(data, w_off + 4) / 65536.0
    return track_id, width, height


def _parse_mdhd(data: bytes, s: int, e: int) -> tuple[int, int, str]:
    version, b = _fullbox(data, s, e)
    if version == 1:
        _fits(b + 30, e)
        timescale, duration = _u32(data, b + 16), _u64(data, b + 20)
        lang = _u16(data, b + 28)
    elif version == 0:
        _fits(b + 18, e)
        timescale, duration = _u32(data, b + 8), _u32(data, b + 12)
        lang = _u16(data, b + 16)
    else:
        raise ValueError("mp4: bad mdhd version")
    if timescale <= 0:
        raise ValueError("mp4: zero mdhd timescale")
    return timescale, duration, _lang_str(lang)


def _parse_stsd(data: bytes, s: int, e: int, handler: str) -> dict:
    _, b = _fullbox(data, s, e)
    _fits(b + 4, e)
    n_entries = _u32(data, b)
    out: dict = {"codec": None, "se_width": None, "se_height": None,
                 "channels": None, "sample_rate": None}
    if n_entries == 0:
        return out
    # first sample entry only (the overwhelmingly common layout; a
    # multi-entry stsd keeps the first codec as the track's label)
    size = _u32(data, b + 4)
    if size < 8 or b + 4 + size > e:
        raise ValueError("mp4: sample entry overruns stsd")
    ent = b + 4
    out["codec"] = data[ent + 4:ent + 8].decode("latin-1")
    if handler == "vide" and size >= 36 + 8:
        out["se_width"] = _u16(data, ent + 32)
        out["se_height"] = _u16(data, ent + 34)
    elif handler == "soun" and size >= 36:
        out["channels"] = _u16(data, ent + 24)
        out["sample_rate"] = _u32(data, ent + 32) / 65536.0
    return out


def _parse_stbl(data: bytes, s: int, e: int, budget: list,
                handler: str) -> dict:
    info: dict = {"n_samples": None, "n_keyframes": None}
    stts_total = None
    for typ, s2, e2 in _boxes(data, s, e, budget):
        if typ == b"stsd":
            info.update(_parse_stsd(data, s2, e2, handler))
        elif typ == b"stsz":
            _, b = _fullbox(data, s2, e2)
            _fits(b + 8, e2)
            info["n_samples"] = _u32(data, b + 4)
        elif typ == b"stts":
            _, b = _fullbox(data, s2, e2)
            _fits(b + 4, e2)
            n = _u32(data, b)
            if b + 4 + 8 * n > e2:
                raise ValueError("mp4: stts entries overrun box")
            stts_total = sum(_u32(data, b + 4 + 8 * i)
                             for i in range(n))
        elif typ == b"stss":
            _, b = _fullbox(data, s2, e2)
            _fits(b + 4, e2)
            n = _u32(data, b)
            if b + 4 + 4 * n > e2:
                raise ValueError("mp4: stss entries overrun box")
            info["n_keyframes"] = n
    if info["n_samples"] is None:
        info["n_samples"] = stts_total
    elif stts_total is not None and stts_total != info["n_samples"]:
        raise ValueError("mp4: stsz/stts sample counts disagree")
    if info["n_keyframes"] is None:
        # no stss box: every sample is a sync sample (8.6.2)
        info["n_keyframes"] = info["n_samples"]
    return info


def _parse_trak(data: bytes, s: int, e: int, budget: list) -> dict:
    track: dict = {"track_id": None, "width": None, "height": None,
                   "handler": None, "timescale": None, "duration": None,
                   "language": "und", "codec": None, "n_samples": None,
                   "n_keyframes": None, "channels": None,
                   "sample_rate": None}
    stbl_span = None
    for typ, s2, e2 in _boxes(data, s, e, budget):
        if typ == b"tkhd":
            (track["track_id"], track["width"],
             track["height"]) = _parse_tkhd(data, s2, e2)
        elif typ == b"mdia":
            for t3, s3, e3 in _boxes(data, s2, e2, budget):
                if t3 == b"mdhd":
                    (track["timescale"], track["duration"],
                     track["language"]) = _parse_mdhd(data, s3, e3)
                elif t3 == b"hdlr":
                    _, b = _fullbox(data, s3, e3)
                    _fits(b + 8, e3)
                    track["handler"] = data[b + 4:b + 8].decode("latin-1")
                elif t3 == b"minf":
                    for t4, s4, e4 in _boxes(data, s3, e3, budget):
                        if t4 == b"stbl":
                            stbl_span = (s4, e4)
    if stbl_span is not None:
        # stbl parses AFTER hdlr so the sample-entry layout (visual vs
        # audio fields) follows the declared handler
        track.update(_parse_stbl(data, *stbl_span, budget,
                                 track["handler"] or ""))
    if track["track_id"] is None:
        raise ValueError("mp4: trak without tkhd")
    return track


def parse_mp4_meta(data: bytes) -> dict:
    """Container metadata of one MP4 payload. Raises ValueError on
    anything malformed; never returns partial garbage silently."""
    if len(data) < 8:
        raise ValueError("mp4: too short")
    budget = [MP4_MAX_BOXES]
    brand = ""
    mvhd = None
    tracks: list[dict] = []
    for typ, s, e in _boxes(data, 0, len(data), budget):
        if typ == b"ftyp":
            if e - s < 4:
                raise ValueError("mp4: ftyp too short")
            brand = data[s:s + 4].decode("latin-1")
        elif typ == b"moov":
            for t2, s2, e2 in _boxes(data, s, e, budget):
                if t2 == b"mvhd":
                    mvhd = _parse_mvhd(data, s2, e2)
                elif t2 == b"trak":
                    if len(tracks) >= MP4_MAX_TRACKS:
                        raise ValueError("mp4: track count cap")
                    tracks.append(_parse_trak(data, s2, e2, budget))
    if mvhd is None:
        raise ValueError("mp4: no moov/mvhd")
    timescale, duration = mvhd
    for t in tracks:
        ts = t["timescale"]
        t["duration_sec"] = (t["duration"] / ts
                             if ts and t["duration"] is not None else None)
    return {"brand": brand, "timescale": timescale, "duration": duration,
            "duration_sec": duration / timescale, "tracks": tracks}


# -- Spark surface -------------------------------------------------------------

MP4_META_SCHEMA = (
    "doc_id long, brand string, movie_duration_sec double,"
    " track_id long, handler string, codec string,"
    " width double, height double, channels long, sample_rate double,"
    " n_samples long, n_keyframes long, track_duration_sec double,"
    " language string, ok boolean, err string")

_META_COLS = ["doc_id", "brand", "movie_duration_sec", "track_id",
              "handler", "codec", "width", "height", "channels",
              "sample_rate", "n_samples", "n_keyframes",
              "track_duration_sec", "language", "ok", "err"]


def extract_mp4_meta(media: DataFrame) -> DataFrame:
    """media(doc_id, payload, …) → one row per TRACK (plus one
    movie-level row with track_id=0 for trackless-but-valid files);
    malformed payloads emit a single ok=false row with the reason in
    ``err`` — the per-row error channel, never a task failure."""
    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    meta = parse_mp4_meta(bytes(payload or b""))
                except (NotImplementedError, ValueError) as exc:
                    rows.append((doc_id, None, None, -1, None, None,
                                 None, None, None, None, None, None,
                                 None, None, False, str(exc)))
                    continue
                head = (doc_id, meta["brand"], meta["duration_sec"])
                if not meta["tracks"]:
                    rows.append(head + (0,) + (None,) * 10
                                + (True, None))
                for t in meta["tracks"]:
                    rows.append(head + (
                        t["track_id"], t["handler"], t["codec"],
                        t["width"], t["height"], t["channels"],
                        t["sample_rate"], t["n_samples"],
                        t["n_keyframes"], t["duration_sec"],
                        t["language"], True, None))
            if not rows:
                continue
            yield pd.DataFrame(rows, columns=_META_COLS)

    return media.mapInPandas(kernel, MP4_META_SCHEMA)


# -- builder (test/interop side: independent spec transcription) ---------------

def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + b"\x00\x00\x00" + payload)


def _lang_pack(lang: str) -> int:
    a, b, c = (ord(ch) - 0x60 for ch in lang)
    return (a << 10) | (b << 5) | c


def build_mp4(brand: str = "isom", movie_timescale: int = 1000,
              movie_duration: int = 0, tracks: list[dict] = (),
              wide: bool = False) -> bytes:
    """Assemble a minimal, spec-valid MP4. Each track dict:
    kind ('video'|'audio'), track_id, timescale, duration,
    language, codec, n_samples, keyframes (list of 1-based sample
    numbers, or None for no stss box), and width/height (video) or
    channels/sample_rate (audio). ``wide`` wraps moov in a 64-bit
    largesize header to exercise that path."""
    def tkhd(t):
        return _full(b"tkhd", 0, struct.pack(
            ">IIII I II HHHH 36x II",
            0, 0, t["track_id"], 0, t["duration"], 0, 0, 0, 0, 0, 0,
            int(t.get("width", 0) * 65536),
            int(t.get("height", 0) * 65536)))

    def mdhd(t):
        return _full(b"mdhd", 0, struct.pack(
            ">IIIIHH", 0, 0, t["timescale"], t["duration"],
            _lang_pack(t.get("language", "und")), 0))

    def hdlr(t):
        h = b"vide" if t["kind"] == "video" else b"soun"
        return _full(b"hdlr", 0, struct.pack(">I", 0) + h
                     + b"\x00" * 12 + b"x\x00")

    def sample_entry(t):
        codec = t["codec"].encode("latin-1")
        if t["kind"] == "video":
            body = (b"\x00" * 6 + struct.pack(">H", 1)
                    + b"\x00" * 16
                    + struct.pack(">HH", int(t.get("width", 0)),
                                  int(t.get("height", 0)))
                    + b"\x00" * 50)
        else:
            body = (b"\x00" * 6 + struct.pack(">H", 1)
                    + b"\x00" * 8
                    + struct.pack(">HHHHI", t.get("channels", 2), 16,
                                  0, 0,
                                  int(t.get("sample_rate", 0) * 65536)))
        return _box(codec, body)

    def stbl(t):
        n = t["n_samples"]
        boxes = [
            _full(b"stsd", 0, struct.pack(">I", 1) + sample_entry(t)),
            _full(b"stts", 0, struct.pack(">III", 1, n, 1)),
            _full(b"stsz", 0, struct.pack(">II", 64, n)),
        ]
        if t.get("keyframes") is not None:
            ks = t["keyframes"]
            boxes.append(_full(b"stss", 0, struct.pack(
                ">I" + "I" * len(ks), len(ks), *ks)))
        return _box(b"stbl", b"".join(boxes))

    def trak(t):
        minf = _box(b"minf", stbl(t))
        mdia = _box(b"mdia", mdhd(t) + hdlr(t) + minf)
        return _box(b"trak", tkhd(t) + mdia)

    mvhd = _full(b"mvhd", 0, struct.pack(
        ">IIII", 0, 0, movie_timescale, movie_duration) + b"\x00" * 80)
    moov_body = mvhd + b"".join(trak(t) for t in tracks)
    if wide:
        moov = (struct.pack(">I", 1) + b"moov"
                + struct.pack(">Q", 16 + len(moov_body)) + moov_body)
    else:
        moov = _box(b"moov", moov_body)
    ftyp = _box(b"ftyp", brand.encode("latin-1")
                + struct.pack(">I", 0) + b"isom")
    return ftyp + moov + _box(b"mdat", b"")
