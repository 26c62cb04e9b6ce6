"""Sketch aggregates over the documents table: the approximate forms a
100 TB profile pass actually runs.

Spark's built-in sketches are the right tool here (JVM-side, mergeable,
one pass): HyperLogLog++ for distinct counts (``approx_count_distinct``),
Greenwald-Khanna for quantiles (``percentile_approx``). Both are
ALGEBRAIC aggregates — partial sketches merge across partitions, so the
sketch-only plan shuffles one round of fixed-size sketch state per group
(never the rows; the EXACT twins below add a (lang, tok) row exchange,
which is exactly the cost a 100 TB profile pass avoids by keeping only
the sketch — plan-asserted in tests). The same code runs streaming
(sketches are the canonical streaming-agg state).

Approximate outputs can't be value-hashed against a DuckDB oracle (the
two engines run different sketch implementations), so these ship with
EXACT twins computed in the same query: the driver checks the exact
columns; pytest gates the sketch columns' relative error against the
exact ones (tests/test_sketch.py) — the measured-not-assumed discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_distinct_profile(docs: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Per-language token-vocabulary profile: exact distinct count next to
    the HLL++ estimate (rsd = target relative standard deviation).

    One explode + one aggregation; at 100 TB you drop the exact column and
    keep the sketch (fixed memory per group vs an O(vocab) hash set)."""
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    return toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("exact_distinct"),
        F.approx_count_distinct("tok", rsd).alias("hll_distinct"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def token_length_quantiles(
    docs: DataFrame, accuracy: int = 1000
) -> DataFrame:
    """Document-length quantile profile per language: exact percentiles
    (SQL ``percentile``, full sort per group) next to the GK-sketch
    ``percentile_approx`` — p50/p90/p99 of tokens-per-document."""
    lens = docs.select(
        "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    pcts = "array(0.5, 0.9, 0.99)"
    return lens.groupBy("lang").agg(
        F.expr(f"percentile(n_tokens, {pcts})").alias("exact_pct"),
        F.expr(f"percentile_approx(n_tokens, {pcts}, {accuracy})").alias(
            "approx_pct"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )
