"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query set
  against all vectors; the dot product is a built-in higher-order-function
  fold (zip_with + aggregate), so it stays in whole-stage codegen. At scale
  the query side is what's broadcast; the corpus streams.
- ``ivf_topk``: IVF-style approximate path — K deterministic centroids,
  assign every vector to its nearest centroid (vectorized numpy pandas UDF),
  probe only the nprobe closest centroids per query. The candidate set per
  query shrinks by ~K/nprobe; the final re-rank is exact.
- ``hyperplane_lsh_buckets``: random-hyperplane signatures for cosine LSH
  blocking (embedding near-dup detection).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Output: (query_id, neighbor_id, rank) — ids only, so the value hash is
    float-rounding-proof.
    """
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    c = rng.randn(n_centroids, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic mini-Lloyd IVF training on a bounded sample.

    The sample is the ``sample_size`` lowest ids (stable across runs and
    cluster sizes); at 100 TB this is still a driver-side constant —
    the standard IVF coarse-quantizer training recipe.
    """
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .toPandas()
    )
    mat = np.asarray(sample[vec_col].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def assign_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(vec_id, centroid) via vectorized argmax of dot products (one matmul
    per Arrow batch). Centroids ride as a broadcast variable."""
    bc = (
        embeddings.sparkSession.sparkContext.broadcast(centroids)
        if centroids is not None
        else None
    )

    def assign(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents: np.ndarray | None = bc.value if bc is not None else None
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if cents is None:
                cents = _centroids(mat.shape[1], n_centroids, seed)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ cents.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "centroid": pd.Series(sims.argmax(axis=1), dtype="int32"),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema="vec_id long, centroid int"
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest centroid cells per query,
    exact cosine re-rank inside the probed cells. The coarse quantizer is
    trained once (bounded sample, deterministic) and broadcast.

    Default geometry note: the synthetic test embeddings are near-uniform
    on the sphere (no cluster structure), so high nprobe/n_centroids ratios
    are needed for recall (measured 0.93 at 8/6, 0.83 at 16/8 on sf0.001).
    Real embedding corpora cluster heavily and run nprobe << n_centroids —
    tune per corpus; the plan shape (cell equi-join + in-cell re-rank) is
    what carries to 100 TB, not these constants."""
    trained = train_centroids(
        embeddings, n_centroids=n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    bc = embeddings.sparkSession.sparkContext.broadcast(trained)

    def q_probes(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents: np.ndarray | None = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if cents is None:
                cents = _centroids(mat.shape[1], n_centroids, seed)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ cents.T
            order = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = np.repeat(pdf[id_col].to_numpy(dtype=np.int64), nprobe)
            yield pd.DataFrame(
                {
                    "query_id": ids,
                    "centroid": pd.Series(order.ravel(), dtype="int32"),
                }
            )

    assigned = assign_centroids(
        embeddings, n_centroids, seed, id_col, vec_col, centroids=trained
    )
    queries = embeddings.filter(F.col(id_col).isin(query_ids))
    probes = queries.select(id_col, vec_col).mapInPandas(
        q_probes, schema="query_id long, centroid int"
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cand = (
        probes.join(assigned.withColumnRenamed("vec_id", "neighbor_id"), "centroid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .join(F.broadcast(qv), "query_id")
        .join(
            embeddings.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "neighbor_id",
        )
        .withColumn(
            "cos",
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — sign pattern across random hyperplanes (cosine LSH)."""

    def sig(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes: np.ndarray | None = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.randn(n_planes, mat.shape[1])
            bits = (mat @ planes.T) > 0
            bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "bucket": pd.Series(bucket, dtype="int64"),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        sig, schema="vec_id long, bucket long"
    )
