"""Triple assembly: (subject, predicate, object) from mention positions.

Rule (the reference semantics our goldens encode, mirroring mehari's
per-transcript consequence build, logic.rs:818-1052): for every predicate
mention p in a turn, subj = nearest entity mention strictly before p, obj =
nearest entity mention strictly after p (token positions); the triple is
emitted iff both exist. Then best-per-group dedup keeps the lowest-ranked
(most severe) predicate per (conv_id, turn_idx, subj, obj) — mehari's
worst-consequence picking (logic.rs:452-513).

Implementation is pure window functions over the mention stream: one shuffle
on (conv_id, turn_idx), reused by both windows (same partitioning), with
`last/first ignorenulls` providing the nearest-neighbor lookup — no UDF, no
self-join. At 100 TB the shuffle key is hash(conv_id, turn_idx); skew is
bounded because a turn has <= TURN_TOKENS mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def assemble_triples(mentions: DataFrame) -> DataFrame:
    """mentions (MENTIONS_SCHEMA) -> triples (conv_id, turn_idx, subj_id,
    pred_id, obj_id, pred_pos), deduped best-per-group."""
    seq = mentions.select(
        "conv_id",
        "turn_idx",
        "pos",
        F.when(F.col("kind") == "E", F.col("ref_id")).alias("entity_id"),
        F.when(F.col("kind") == "P", F.col("canon_id")).alias("p_canon"),
        F.when(F.col("kind") == "P", F.col("rank")).alias("p_rank"),
    )
    w = W.partitionBy("conv_id", "turn_idx").orderBy("pos")
    subj = F.last("entity_id", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    obj = F.first("entity_id", ignorenulls=True).over(
        w.rowsBetween(1, W.unboundedFollowing)
    )
    cand = (
        seq.withColumn("subj_id", subj)
        .withColumn("obj_id", obj)
        .filter(
            F.col("p_canon").isNotNull()
            & F.col("subj_id").isNotNull()
            & F.col("obj_id").isNotNull()
        )
    )
    dedup = W.partitionBy("conv_id", "turn_idx", "subj_id", "obj_id").orderBy(
        F.asc("p_rank"), F.asc("p_canon"), F.asc("pos")
    )
    return (
        cand.withColumn("rn", F.row_number().over(dedup))
        .filter(F.col("rn") == 1)
        .select(
            "conv_id",
            "turn_idx",
            "subj_id",
            F.col("p_canon").alias("pred_id"),
            "obj_id",
            F.col("pos").alias("pred_pos"),
        )
    )
