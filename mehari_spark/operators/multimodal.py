"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode / feature-extract runs as Arrow-batched ``mapInPandas``. The actual
codec step is STUBBED (image/audio libraries are not in this container):
``decode_stub`` raises NotImplementedError unless ``fake=True``, in which
case it produces a deterministic fake feature vector from the bytes — the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is real
and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, codec:string>"
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents: payload = utf-8 bytes
    of the text, metadata derived from doc stats. Stands in for an Iceberg
    media table at prod."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(640)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(480)) + 1).cast("int").alias("height"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def _decode_batch(pdf: pd.DataFrame, dim: int, fake: bool) -> pd.DataFrame:
    if not fake:
        # real deployment: PIL/librosa/ffmpeg decode per Arrow batch
        raise NotImplementedError(
            "media codecs not available in this container; pass fake=True"
        )
    feats = []
    for payload in pdf["payload"].tolist():
        digest = hashlib.sha256(bytes(payload or b"")).digest()
        # deterministic fake features: bytes of the digest, tiled to dim
        arr = np.frombuffer((digest * (dim // 32 + 1))[:dim], dtype=np.uint8)
        feats.append((arr.astype(np.float32) / 255.0).tolist())
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"].astype("int64"),
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
            "features": feats,
        }
    )


def decode_features(
    media: DataFrame, dim: int = 32, fake: bool = True
) -> DataFrame:
    """media -> (media_id, kind, n_bytes, features array<float>) via
    mapInPandas; the decode kernel is the stub point."""

    def run(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _decode_batch(pdf, dim, fake)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, n_bytes long, features array<float>"
    )
