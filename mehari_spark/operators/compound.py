"""Compound synthetic records: fold a group of triples into ONE merged record.

Mehari analog: ``predict_multiple`` (reference mehari/src/annotate/seqvars/
logic.rs:1990-2133) folds a buffered phase group of variants on the same
transcript into a single synthetic compound record, flushing per group
(buffer contract compound.rs:54-60, 96-170). Ours: all triples sharing
(conv_id, subj_id) with >= ``min_parts`` distinct (pred, obj) parts merge
into one synthetic triple whose predicate is the reserved COMPOUND id.

Three interchangeable implementations, cross-asserted in tests:

- ``compound_triples``        — the production grouped kernel (X4 shape):
  groupBy collect_list -> Arrow-batched fold in mapInPandas, one shuffle on
  (conv_id, subj_id), thousands of groups per batch (the coref batching
  discipline — per-group applyInPandas would pay one Arrow trip per group).
- ``compound_triples_sql``    — the declarative reference: groupBy + HAVING,
  pure Catalyst aggregates (this is also the DuckDB-oracle shape).
- ``datagen.reference_compounds`` — pure-Python golden.

Synthetic record fields mirror predict_multiple's merged annotation: the
part count, the merged extent (first/last turn), and the extreme members
(min/max obj, worst = min rank part's pred) as scalar columns so the DuckDB
value-hash is array-free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMPOUND_PRED_ID = 1000


def compound_triples_sql(triples: DataFrame, min_parts: int = 2) -> DataFrame:
    """Declarative reference: one synthetic record per (conv_id, subj_id)
    group holding >= min_parts distinct (pred_id, obj_id) parts."""
    parts = triples.select(
        "conv_id", "subj_id", "pred_id", "obj_id", "turn_idx"
    )
    g = parts.groupBy("conv_id", "subj_id").agg(
        F.countDistinct("pred_id", "obj_id").alias("n_parts"),
        F.lit(COMPOUND_PRED_ID).alias("pred_id_synth"),
        F.min("obj_id").alias("min_obj"),
        F.max("obj_id").alias("max_obj"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.min(F.col("pred_id")).alias("min_pred"),
    )
    return g.filter(F.col("n_parts") >= min_parts).select(
        "conv_id",
        "subj_id",
        F.col("pred_id_synth").alias("pred_id"),
        "n_parts",
        "min_obj",
        "max_obj",
        "first_turn",
        "last_turn",
        "min_pred",
    )


def compound_triples(triples: DataFrame, min_parts: int = 2) -> DataFrame:
    """Production grouped kernel (J9/X4): collect each (conv, subj) group's
    parts, fold in an Arrow batch. Result-identical to compound_triples_sql
    (asserted in tests); exists because the reference fold is imperative —
    real deployments hang richer merge logic (part ordering, phase checks,
    compound.rs:96-170) off this kernel where SQL aggregates run out."""
    agg = triples.groupBy("conv_id", "subj_id").agg(
        F.collect_list(F.struct("pred_id", "obj_id", "turn_idx")).alias("parts")
    )

    def fold(batches):
        for pdf in batches:
            rows = []
            for conv, subj, parts in zip(
                pdf["conv_id"].tolist(),
                pdf["subj_id"].tolist(),
                pdf["parts"].tolist(),
            ):
                distinct = {(int(p["pred_id"]), int(p["obj_id"])) for p in parts}
                if len(distinct) < min_parts:
                    continue
                turns = [int(p["turn_idx"]) for p in parts]
                rows.append(
                    (
                        conv,
                        int(subj),
                        COMPOUND_PRED_ID,
                        len(distinct),
                        min(o for _p, o in distinct),
                        max(o for _p, o in distinct),
                        min(turns),
                        max(turns),
                        min(p for p, _o in distinct),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id",
                    "subj_id",
                    "pred_id",
                    "n_parts",
                    "min_obj",
                    "max_obj",
                    "first_turn",
                    "last_turn",
                    "min_pred",
                ],
            ).astype(
                {
                    "subj_id": "int64",
                    "pred_id": "int64",
                    "n_parts": "int64",
                    "min_obj": "int64",
                    "max_obj": "int64",
                    "first_turn": "int32",
                    "last_turn": "int32",
                    "min_pred": "int64",
                }
            )

    return agg.mapInPandas(
        fold,
        schema=(
            "conv_id string, subj_id long, pred_id long, n_parts long, "
            "min_obj long, max_obj long, first_turn int, last_turn int, "
            "min_pred long"
        ),
    )


def with_compounds(triples: DataFrame, min_parts: int = 2) -> DataFrame:
    """The predict_multiple emission contract: original triples PLUS the
    synthetic compound records appended into the same stream (is_synthetic
    flags them), ready for the bucketed write."""
    orig = triples.select(
        "conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"
    ).withColumn("is_synthetic", F.lit(False))
    synth = compound_triples(triples, min_parts).select(
        "conv_id",
        F.col("first_turn").alias("turn_idx"),
        "subj_id",
        "pred_id",
        F.col("min_obj").alias("obj_id"),
    ).withColumn("is_synthetic", F.lit(True))
    return orig.unionByName(synth)
