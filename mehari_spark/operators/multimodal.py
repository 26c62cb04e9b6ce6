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


def frame_sample(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 64, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row PER SAMPLED FRAME, exploded from
    each video payload — the batch shape a real ffmpeg kernel produces
    (frames are evenly spaced over the payload; the decode itself is the
    stub point, deterministic byte-slices stand in for decoded frames).

    Output is long-format (media_id, frame_idx, frame binary, offset), so
    downstream per-frame feature extraction parallelizes across frames, not
    videos — at 100 TB the hot videos would otherwise pin executors."""

    def run(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "video codecs not available in this container; pass fake=True"
            )
        for pdf in it:
            mids: list[int] = []
            fidx: list[int] = []
            frames: list[bytes] = []
            offs: list[int] = []
            for mid, kind, payload in zip(
                pdf["media_id"].tolist(), pdf["kind"].tolist(), pdf["payload"].tolist()
            ):
                if kind != "video":
                    continue
                buf = bytes(payload or b"")
                if not buf:
                    continue
                step = max(1, len(buf) // n_frames)
                for i in range(min(n_frames, len(buf))):
                    off = i * step
                    mids.append(mid)
                    fidx.append(i)
                    frames.append(buf[off : off + frame_bytes])
                    offs.append(off)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                    "offset": pd.Series(offs, dtype="int64"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary, offset long"
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: pure-Catalyst recompute of target dimensions
    (aspect-preserving clamp to max_side) — the metadata half of a resize
    stays JVM-side; only the pixel work would enter the (stubbed) kernel."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return media.withColumn(
        "resized",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
            scale.alias("scale"),
        ),
    )
