"""Golden-comparison join (mehari `verify seqvars` analog, J11).

Mehari classifies each (variant, feature) row of a VEP TSV against its own
prediction as ok / mismatch / no_match / no_tx (verify/seqvars.rs:201-352).
Ours: full-outer join two triple sets on the identity key and classify:

- ``ok``            — identical triple in both
- ``pred_mismatch`` — same (conv, turn, subj, obj) but different predicate
- ``missing``       — only in the expected set (recall loss)
- ``extra``         — only in the got set (precision loss)

Plus ``pr_summary`` aggregating precision/recall — the P/R >= 0.95 gate as
a first-class distributed operator rather than a test-only collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY = ["conv_id", "turn_idx", "subj_id", "obj_id"]


def classify_triples(got: DataFrame, expected: DataFrame) -> DataFrame:
    g = got.select(*_KEY, F.col("pred_id").alias("pred_got"))
    e = expected.select(*_KEY, F.col("pred_id").alias("pred_exp"))
    joined = g.join(e, _KEY, "full_outer")
    status = (
        F.when(F.col("pred_got").isNull(), "missing")
        .when(F.col("pred_exp").isNull(), "extra")
        .when(F.col("pred_got") == F.col("pred_exp"), "ok")
        .otherwise("pred_mismatch")
    )
    return joined.withColumn("status", status)


def verify_summary(got: DataFrame, expected: DataFrame) -> DataFrame:
    """One row: counts per class + precision/recall (exact-match semantics)."""
    c = classify_triples(got, expected)
    agg = c.agg(
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("status") == "pred_mismatch", 1).otherwise(0)).alias(
            "n_pred_mismatch"
        ),
        F.sum(F.when(F.col("status") == "missing", 1).otherwise(0)).alias(
            "n_missing"
        ),
        F.sum(F.when(F.col("status") == "extra", 1).otherwise(0)).alias("n_extra"),
    )
    return agg.select(
        "n_ok",
        "n_pred_mismatch",
        "n_missing",
        "n_extra",
        F.round(
            F.col("n_ok")
            / (F.col("n_ok") + F.col("n_pred_mismatch") + F.col("n_extra")),
            6,
        ).alias("precision"),
        F.round(
            F.col("n_ok")
            / (F.col("n_ok") + F.col("n_pred_mismatch") + F.col("n_missing")),
            6,
        ).alias("recall"),
    )
