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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CanonRule:
    """One canonicalization rule: rewrite / suppress / rank-override.

    ``target_id=None`` suppresses the predicate. ``rank_override`` pins the
    severity rank of the REWRITTEN predicate (mehari's special-case rank
    fixes, consequences_fix_special_cases, logic.rs:1183-1371); when the
    rule chains, the LAST override along the chain wins."""

    match_id: int
    target_id: int | None
    rank_override: int | None = None


# The demo rule corpus (>= 10 rules, the adjust_vep_terms +
# consequences_fix_special_cases discipline, logic.rs:1054-1371):
# umbrella rewrites, a suppression, a 2-hop chain onto a synthetic canonical
# id with a rank override, a pure rank override (identity rewrite), chains
# defined over non-occurring ids (closure still exercised in unit tests),
# and a defensive cycle pair.
CANON_RULES: list[CanonRule] = [
    CanonRule(103, 101),        # umbrella: sort -> join family head
    CanonRule(110, None),       # suppression: dup is never emitted
    CanonRule(109, 108),        # hash -> agg
    CanonRule(105, 150),        # chain head: scan -> staged id ...
    CanonRule(150, 151, 42),    # ... -> final synthetic canonical, rank 42
    CanonRule(104, 103),        # chains onto the 103->101 umbrella
    CanonRule(102, 101),        # direct umbrella (non-occurring input)
    CanonRule(107, 108),        # direct umbrella (non-occurring input)
    CanonRule(111, None),       # suppression of a non-occurring id
    CanonRule(106, 106, 66),    # identity rewrite, pure rank override
    CanonRule(112, 113),        # cycle pair: defensively keeps original
    CanonRule(113, 112),
]


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


def close_rule_table(
    rules: list[CanonRule],
) -> dict[int, tuple[int | None, int | None]]:
    """Transitively close a CanonRule list -> {match: (final_target|None,
    final_rank_override|None)} (driver-side; the table is tiny).

    Semantics: chains follow target links until a fixpoint / suppression;
    the last rank_override seen along the chain wins; a chain that reaches a
    suppression suppresses; a CYCLE keeps the original id with no override
    (defensive — mirrors close_rules)."""
    base = {r.match_id: r for r in rules}
    closed: dict[int, tuple[int | None, int | None]] = {}
    for k in base:
        seen = {k}
        cur: int | None = k
        rank: int | None = None
        while cur is not None:
            rule = base.get(cur)
            if rule is None:
                break
            if rule.rank_override is not None:
                rank = rule.rank_override
            nxt = rule.target_id
            if nxt is None:
                cur = None
                break
            if nxt == cur:  # identity rewrite: fixpoint
                break
            if nxt in seen:  # cycle -> keep original, drop overrides
                cur, rank = k, None
                break
            seen.add(nxt)
            cur = nxt
        closed[k] = (cur, rank)
    return closed


def canonicalize_full(
    triples: DataFrame,
    rules: list[CanonRule],
    kb_ranks: DataFrame,
    pred_col: str = "pred_id",
) -> DataFrame:
    """Rule-corpus canonicalization with rank resolution.

    Applies the closed rule table (rewrites + suppressions) and emits a
    ``canon_rank`` column: the chain's rank_override when one fired, else
    the KB rank of the FINAL predicate id (``kb_ranks``: (pred_id, rank)).
    Both hops are broadcast joins on the fact stream — zero fact shuffles,
    the annotator-chain shape."""
    spark = triples.sparkSession
    closed = close_rule_table(rules)
    rule_df = spark.createDataFrame(
        [
            (int(k), None if t is None else int(t), r)
            for k, (t, r) in closed.items()
        ],
        "match_id long, target_id long, rank_override int",
    )
    joined = triples.join(
        F.broadcast(rule_df), triples[pred_col] == rule_df.match_id, "left"
    )
    rewritten = (
        joined.filter(F.col("match_id").isNull() | F.col("target_id").isNotNull())
        .withColumn(pred_col, F.coalesce(F.col("target_id"), F.col(pred_col)))
        .drop("match_id", "target_id")
    )
    kb = kb_ranks.select(
        F.col("pred_id").alias("_kb_pred"), F.col("rank").alias("_kb_rank")
    )
    return (
        rewritten.join(
            F.broadcast(kb), rewritten[pred_col] == F.col("_kb_pred"), "left"
        )
        .withColumn(
            "canon_rank",
            F.coalesce(F.col("rank_override"), F.col("_kb_rank")).cast("int"),
        )
        .drop("rank_override", "_kb_pred", "_kb_rank")
    )
