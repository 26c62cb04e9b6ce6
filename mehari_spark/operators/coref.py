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
    """-> (conv_id, entity_id, cluster_id) for every entity in a triple.

    One shuffle (groupBy conv_id + collect_list of the tiny per-conv edge
    list), then union-find over THOUSANDS of conversations per Arrow batch
    via mapInPandas — per-group applyInPandas pays one Arrow round trip per
    conversation, which at 10^8 conversations is pure overhead; batching
    amortizes it to one per ~10k convs."""
    edges = coref_edges(triples)
    agg = edges.groupBy("conv_id").agg(
        F.collect_list(F.struct("src", "dst")).alias("es")
    )

    def cc_batches(it):
        for pdf in it:
            convs: list[str] = []
            ents: list[int] = []
            clusters: list[int] = []
            for conv, es in zip(pdf["conv_id"].tolist(), pdf["es"].tolist()):
                uf = UnionFind()
                for e in es:
                    uf.union(int(e["src"]), int(e["dst"]))
                comp = uf.components()
                for k, v in comp.items():
                    convs.append(conv)
                    ents.append(k)
                    clusters.append(v)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(convs, dtype="object"),
                    "entity_id": pd.Series(ents, dtype="int64"),
                    "cluster_id": pd.Series(clusters, dtype="int64"),
                }
            )

    return agg.mapInPandas(
        cc_batches, schema="conv_id string, entity_id long, cluster_id long"
    )


def connected_components_global(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    with_rounds: bool = False,
):
    """Generic CC over (src, dst) long ids -> (node, component).
    With ``with_rounds=True`` returns (labels, n_rounds) so callers/tests can
    assert the O(log n) convergence bound.

    Min-label propagation with pointer jumping: each round every node takes
    min(own label, neighbors' labels), then follows label->label one hop
    (path halving). Convergence in O(log n) rounds — the Kiveris et al.
    (SoCC'14) large-star/small-star bound — each round two shuffles on node
    id, expressed as joins/aggs so Catalyst/AQE handle skew. Iteration state
    is localCheckpoint'ed to cut the growing lineage.
    """
    # materialize the (possibly expensive) upstream edge pipeline ONCE
    # before mirroring — a union of two selects over the same lineage would
    # execute the whole upstream plan twice in one job
    ed = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    sym = (
        ed.union(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # right-size the per-round parallelism to the materialized edge count:
    # each round is a handful of joins over `sym`-sized data, and scheduling
    # 64 near-empty tasks x 4 stages x O(log n) rounds dominates small/medium
    # graphs. ~100k edges/partition keeps tasks meaningful; large graphs keep
    # the session's full parallelism.
    n_edges = sym.count()
    spark = edges.sparkSession
    cur_par = int(spark.conf.get("spark.sql.shuffle.partitions", "64"))
    parts = max(4, min(cur_par, n_edges // 100_000 + 1))
    if parts < sym.rdd.getNumPartitions():
        sym = sym.repartition(parts, "u").localCheckpoint(eager=True)
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("node"), F.least("u", "mn").alias("label")
        )
        .localCheckpoint(eager=True)
    )

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # 1) neighbor-min: cand(v) = min label among v and its neighbors
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("u"), F.col("label").alias("lu")),
                "u",
            )
            .groupBy("v")
            .agg(F.min("lu").alias("nbr_min"))
            .select(F.col("v").alias("node"), "nbr_min")
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        # 2) pointer jump: label := label(label) (path halving)
        lab2 = labels.select(
            F.col("node").alias("label"), F.col("label").alias("jumped")
        )
        jumped = stepped.join(lab2, "label", "left").select(
            "node", F.least(F.col("label"), F.coalesce("jumped", "label")).alias("label")
        )
        new_labels = jumped.localCheckpoint(eager=True)
        # convergence check without a join: labels are monotone
        # non-increasing (every update is a least()), so sum(label) is
        # strictly smaller iff ANY label changed — one cheap agg over the
        # just-checkpointed data instead of a join + count job per round
        new_sum = new_labels.agg(F.sum("label")).first()[0]
        prev_sum = getattr(labels, "_cc_sum", None)
        if prev_sum is None:
            prev_sum = labels.agg(F.sum("label")).first()[0]
        labels = new_labels
        labels._cc_sum = new_sum
        if new_sum == prev_sum:
            break
    out = labels.select(F.col("node"), F.col("label").alias("component"))
    return (out, rounds) if with_rounds else out
