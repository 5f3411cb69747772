"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The image/audio codec libraries are not in this
container, so the *codec* step is stubbed (clearly-marked
NotImplementedError / deterministic byte-level fallback) while the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested (per the driver's multimodal requirement).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "features array<double>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode requires a codec library (PIL/libjpeg) that is
    intentionally absent here."""
    raise NotImplementedError(
        "image codec not available in this environment; use "
        "byte_features/frame_sample for the tested plumbing path"
    )


def byte_features(payload: bytes, bins: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: normalized byte histogram.

    Real byte-level computation (not a mock), independent of any codec —
    the UDF signature, batch shape and schema are exactly what a real
    decoder would use."""
    if not payload:
        return [0.0] * bins
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[:bins]
    return (hist / len(arr)).tolist()


def extract_media_features(media: DataFrame, bins: int = 8) -> DataFrame:
    """media table → per-item features via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "features": [byte_features(p, bins) for p in payloads],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, frame_size: int = 256, every_nth: int = 4
) -> DataFrame:
    """'Video' frame sampling on the opaque payload: split into fixed-size
    chunks, keep every nth — the partition-preserving explode shape a real
    frame sampler produces (1 media row → m frame rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                chunks = [
                    p[o : o + frame_size] for o in range(0, len(p), frame_size)
                ]
                for i, ch in enumerate(chunks):
                    if i % every_nth == 0:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(ch)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def synthesize_media(docs: DataFrame, kind: str = "video") -> DataFrame:
    """Deterministic fake media table from the documents table (payload =
    repeated utf-8 text bytes) — fixture for the plumbing tests."""
    payload = F.encode(F.repeat(F.col("text"), 4), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
