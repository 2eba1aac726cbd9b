"""Multimodal column plumbing: binary media + typed metadata.

Media ride as opaque ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample stages are ``mapInPandas`` over
Arrow batches so bytes never round-trip through Python row objects.

Two decode modes:

* ``decode_mode='fake'`` — deterministic sha256-derived stand-ins, kept
  as the SQL-oracle-checkable path (DuckDB reproduces the digests).
* ``decode_mode='real'`` — REAL dependency-free from-spec codecs:
  netpbm P6, RIFF/WAVE PCM (``codecs.py``), PNG at full baseline
  (r7), JPEG baseline+progressive (``jpeg.py``, r7), GIF incl.
  animation (``gif.py``, r8), BMP/ICO (r8), WebP-lossless
  (``webp.py``, r9). MP4 container METADATA is real too
  (``mp4.py``, r9 — duration/tracks/codecs/keyframes); decoding its
  compressed video *frames* (H.264/AV1) needs ffmpeg-class codecs
  this container doesn't ship, so frame paths surface per-row as
  ok=false with the reason in ``err``, never failing the job.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from jsonextract_spark.datapipe import codecs

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary,"
                " width int, height int, n_frames int")

FEATURE_SCHEMA = ("doc_id long, media_type string, feat array<float>,"
                  " ok boolean, err string")

FEAT_DIM = 32


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for image/audio decode + embed: SHA-256 of
    the payload expanded to FEAT_DIM floats in [-1, 1)."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEAT_DIM * 4) // len(h) + 1))[:FEAT_DIM * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / 2**31 - 1.0).astype(np.float32)


def decode_features(media: DataFrame,
                    decode_mode: str = "fake") -> DataFrame:
    """media(doc_id, media_type, payload, ...) -> per-item feature rows."""
    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                try:
                    if decode_mode == "fake":
                        feats.append(_fake_decode(bytes(payload or b""),
                                                  mtype))
                    else:
                        feats.append(codecs.real_decode_features(
                            bytes(payload or b""), mtype))
                    oks.append(True)
                    errs.append(None)
                except (NotImplementedError, ValueError) as e:
                    # per-item error channel: unsupported codec or
                    # malformed payload never fails the job
                    feats.append(np.zeros(FEAT_DIM, dtype=np.float32))
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat": [f.tolist() for f in feats],
                "ok": oks,
                "err": errs,
            })

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZE_SCHEMA = ("doc_id long, media_type string, payload binary,"
                 " width int, height int, ok boolean, err string")

FRAME_SCHEMA = ("doc_id long, sample_no long, frame_idx long,"
                " frame binary, ok boolean, err string")


def resize_media(media: DataFrame, width: int, height: int,
                 decode_mode: str = "fake") -> DataFrame:
    """Resize stage over binary media columns (mapInPandas, one row per
    item). decode_mode='fake' emits a deterministic stand-in payload —
    the sha256 hex of ``payload + b":WxH"`` — so the whole Arrow path is
    SQL-oracle-checkable (DuckDB computes the same digest); 'real'
    decodes netpbm P6, nearest-neighbor resamples, and re-encodes
    canonical P6 bytes (codecs.py — compressed formats report their
    missing codec per row)."""
    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f":{width}x{height}".encode()
        for pdf in batches:
            outs, oks, errs = [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                try:
                    if decode_mode == "fake":
                        outs.append(hashlib.sha256(
                            bytes(payload or b"") + tag)
                            .hexdigest().encode())
                    elif mtype in codecs.PPM_TYPES:
                        img, _ = codecs.parse_ppm(bytes(payload or b""))
                        outs.append(codecs.encode_ppm(
                            codecs.resize_nearest(img, width, height)))
                    elif mtype in codecs.GIF_TYPES:
                        # first rendered frame, re-encoded canonical P6
                        # (resize output is a raw image, not a GIF)
                        from jsonextract_spark.datapipe.gif import \
                            parse_gif
                        img = parse_gif(bytes(payload or b""))[0]
                        outs.append(codecs.encode_ppm(
                            codecs.resize_nearest(img, width, height)))
                    elif mtype in codecs.WEBP_TYPES:
                        from jsonextract_spark.datapipe.webp import \
                            parse_webp
                        img = parse_webp(bytes(payload or b""))
                        outs.append(codecs.encode_ppm(
                            codecs.resize_nearest(img, width, height)))
                    elif mtype in codecs.TIFF_TYPES:
                        from jsonextract_spark.datapipe.tiff import \
                            parse_tiff
                        img = parse_tiff(bytes(payload or b""))
                        outs.append(codecs.encode_ppm(
                            codecs.resize_nearest(img, width, height)))
                    else:
                        raise NotImplementedError(
                            f"no dependency-free resize for {mtype} "
                            "(PIL/libvips not bundled here)")
                    oks.append(True)
                    errs.append(None)
                except (NotImplementedError, ValueError) as e:
                    outs.append(b"")
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": outs,
                "width": width,
                "height": height,
                "ok": oks,
                "err": errs,
            })

    return media.mapInPandas(kernel, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, k: int = 4,
                  decode_mode: str = "fake") -> DataFrame:
    """Frame-sampling stage: fan each media item out to ``k`` evenly
    spaced frames (``frame_idx = (j * n) // k``); items with zero
    frames emit nothing. Fake frames are the sha256 hex of
    ``payload + b":f<idx>"`` (SQL-reproducible, ``n`` from the metadata
    column). 'real' parses the payload as a netpbm multi-image stream
    (P6 frames back to back) or an animated GIF (r8 — composited
    canvas frames from the real codec), takes ``n`` from the PARSED
    frame count — metadata can lie, pixels can't — and emits each
    selected frame as
    canonical P6 bytes; unsupported containers / malformed streams emit
    one ok=false row with frame_idx=-1."""
    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, samples, idxs, frames, oks, errs = [], [], [], [], [], []
            for doc_id, payload, mtype, n_meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_type"],
                    pdf["n_frames"]):
                if decode_mode == "fake":
                    n = int(n_meta or 0)
                    if n <= 0:
                        continue
                    for j in range(k):
                        idx = (j * n) // k
                        frames.append(hashlib.sha256(
                            bytes(payload or b"") + f":f{idx}".encode())
                            .hexdigest().encode())
                        oks.append(True)
                        errs.append(None)
                        ids.append(doc_id)
                        samples.append(j)
                        idxs.append(idx)
                    continue
                try:
                    if mtype in codecs.PPM_TYPES:
                        imgs = codecs.iter_ppm_frames(
                            bytes(payload or b""))
                    elif mtype in codecs.GIF_TYPES:
                        # real animated-GIF path (r8): frames are the
                        # composited canvases the gif codec renders
                        from jsonextract_spark.datapipe.gif import \
                            parse_gif
                        imgs = parse_gif(bytes(payload or b""))
                    elif mtype in codecs.TIFF_TYPES:
                        # multi-page TIFF (r9): pages of the IFD chain
                        from jsonextract_spark.datapipe.tiff import \
                            parse_tiff_frames
                        imgs = parse_tiff_frames(bytes(payload or b""))
                    else:
                        raise NotImplementedError(
                            f"no dependency-free frame decode for "
                            f"{mtype} (pyav/ffmpeg not bundled here)")
                    n = len(imgs)
                    for j in range(k):
                        idx = (j * n) // k
                        frames.append(codecs.encode_ppm(imgs[idx]))
                        oks.append(True)
                        errs.append(None)
                        ids.append(doc_id)
                        samples.append(j)
                        idxs.append(idx)
                except (NotImplementedError, ValueError) as e:
                    frames.append(b"")
                    oks.append(False)
                    errs.append(str(e))
                    ids.append(doc_id)
                    samples.append(0)
                    idxs.append(-1)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "sample_no": pd.Series(samples, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame": frames,
                "ok": pd.Series(oks, dtype="bool"),
                "err": pd.Series(errs, dtype="object"),
            })

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def synth_media(spark, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake binary payload per doc (for tests)."""
    from pyspark.sql import functions as F
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 2 == 0, F.lit("image/png"))
         .otherwise(F.lit("audio/wav")).alias("media_type"),
        F.encode(F.concat(F.lit("payload-"), F.col(id_col)), "utf-8")
         .alias("payload"),
        (F.col(id_col) % 640).cast("int").alias("width"),
        (F.col(id_col) % 480).cast("int").alias("height"),
        (F.col(id_col) % 24).cast("int").alias("n_frames"))
