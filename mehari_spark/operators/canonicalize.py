"""Predicate canonicalization: rule-table rewrites onto stable predicate IDs.

The mehari analog is HGVS/SO normalization: a fixed ontology of terms with a
severity order (terms.rs:78-397) plus umbrella rewrites and suppression
rules (adjust_vep_terms / consequences_fix_special_cases,
logic.rs:1054-1371). SURVEY.md §7.2(5) demands this be a *testable rule
table*, not ad-hoc code — so rules are data: (match_id, rewrite_to | NULL).

A NULL rewrite_to suppresses the predicate (row dropped); transitive chains
are closed at rule-compile time on the driver (the table is tiny), so the
executor-side operation is a single broadcast-join hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def close_rules(rules: dict[int, int | None]) -> dict[int, int | None]:
    """Transitively close a {pred_id: rewrite_to|None} rule table (driver-side)."""
    closed: dict[int, int | None] = {}
    for k in rules:
        seen = {k}
        cur: int | None = k
        while cur is not None and cur in rules and rules[cur] != cur:
            cur = rules[cur]
            if cur in seen:  # cycle -> keep original (defensive)
                cur = k
                break
            seen.add(cur)
        closed[k] = cur
    return closed


def canonicalize_predicates(
    triples: DataFrame, rules: dict[int, int | None], pred_col: str = "pred_id"
) -> DataFrame:
    """Apply the closed rule table to ``pred_col`` via a broadcast join.

    Unmatched predicates pass through unchanged; suppressed (NULL target)
    rows are dropped.
    """
    spark = triples.sparkSession
    closed = close_rules(rules)
    rule_df = spark.createDataFrame(
        [(int(k), None if v is None else int(v)) for k, v in closed.items()],
        "match_id long, target_id long",
    )
    joined = triples.join(
        F.broadcast(rule_df), triples[pred_col] == rule_df.match_id, "left"
    )
    return (
        joined.filter(F.col("match_id").isNull() | F.col("target_id").isNotNull())
        .withColumn(pred_col, F.coalesce(F.col("target_id"), F.col(pred_col)))
        .drop("match_id", "target_id")
    )
