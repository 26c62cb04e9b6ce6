"""Cross-turn coreference: edge list -> connected components.

Mehari analogs: compound-variant grouping buffers phase-linked variants per
transcript (compound.rs:96-170) and SV clustering merges records by overlap
into clusters (strucvars/mod.rs:3189-3290). Our version: entities that
co-occur as (subj, obj) of a triple anywhere in a conversation are linked;
clusters are the connected components of that per-conversation graph, with
the min entity_id as the stable cluster label.

Two implementations:

- ``coref_clusters``: edges never cross conversations, so CC runs per
  conversation inside ``applyInPandas`` with a bounded union-find
  (SURVEY.md §7.4: "never global CC — partition by conv_id"). One shuffle on
  conv_id; each group is tiny (<= distinct entities of one conversation).
- ``connected_components_global``: the GraphFrames-style alternating
  large-star/small-star iteration built from joins + aggregations, for
  graphs whose edges DO cross the partition key (used by the dedup
  clustering path). Converges in O(log n) rounds; each round is one shuffle
  on node id, AQE-coalesced.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.unionfind import UnionFind


def coref_edges(triples: DataFrame) -> DataFrame:
    """(conv_id, src, dst) distinct entity-entity edges, src < dst."""
    return (
        triples.select(
            "conv_id",
            F.least("subj_id", "obj_id").alias("src"),
            F.greatest("subj_id", "obj_id").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def coref_clusters(triples: DataFrame) -> DataFrame:
    """-> (conv_id, entity_id, cluster_id) for every entity in a triple."""
    edges = coref_edges(triples)

    def cc_group(pdf: pd.DataFrame) -> pd.DataFrame:
        uf = UnionFind()
        for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            uf.union(int(a), int(b))
        comp = uf.components()
        conv = pdf["conv_id"].iloc[0]
        return pd.DataFrame(
            {
                "conv_id": [conv] * len(comp),
                "entity_id": pd.Series(list(comp.keys()), dtype="int64"),
                "cluster_id": pd.Series(
                    [comp[k] for k in comp.keys()], dtype="int64"
                ),
            }
        )

    return edges.groupBy("conv_id").applyInPandas(
        cc_group, schema="conv_id string, entity_id long, cluster_id long"
    )


def connected_components_global(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Generic CC over (src, dst) long ids -> (node, component).

    Alternating small-star/large-star (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC'14), expressed as DataFrame joins/aggs so
    Catalyst/AQE pick the physical plan. Label = min node id in component.
    """
    spark = edges.sparkSession
    # initial labels: every node points to min(neighbor, self)
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), F.least("label", "node").alias("label"))
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    e = e.localCheckpoint(eager=True) if _can_checkpoint(spark) else e.cache()

    for _ in range(max_iter):
        lu = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
        lv = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
        # propagate: each node adopts min(label of self, labels of neighbors)
        prop = (
            e.join(lu, "u").join(lv, "v")
            .select(
                F.col("u").alias("node"), F.least("lu", "lv").alias("cand")
            )
            .union(
                e.join(lu, "u").join(lv, "v").select(
                    F.col("v").alias("node"), F.least("lu", "lv").alias("cand")
                )
            )
        )
        new_labels = (
            labels.join(prop.groupBy("node").agg(F.min("cand").alias("cand")), "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("cand", "label")).alias("label"),
            )
        )
        new_labels = (
            new_labels.localCheckpoint(eager=True)
            if _can_checkpoint(spark)
            else new_labels.cache()
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "node")
            .filter(F.col("o.label") != F.col("n.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def _can_checkpoint(spark) -> bool:
    return True
