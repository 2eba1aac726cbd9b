"""Multimodal column plumbing: binary media + typed metadata.

Media ride as opaque ``binary`` columns with a metadata struct; decode /
feature-extract stages are ``mapInPandas`` over Arrow batches so bytes
never round-trip through Python row objects. The actual codecs
(PIL/ffmpeg) are not in this container, so the decode kernel is STUBBED:
``decode_mode='fake'`` produces deterministic fake features (so the
Spark-side plumbing — schema, batching, partitioning — is fully real and
tested), ``decode_mode='real'`` raises NotImplementedError where the
codec call belongs.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

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
                        # Real path: PIL.Image.open / soundfile.read /
                        # frame-sample via pyav — not available here.
                        raise NotImplementedError(
                            f"real decode for {mtype}: codec libs not "
                            "bundled in this environment")
                    oks.append(True)
                    errs.append(None)
                except NotImplementedError as e:
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
