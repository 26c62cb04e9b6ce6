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

Oracle discipline: the sketch VALUES can't be value-hashed against DuckDB
(different sketch implementations), so the registry entries emit the
EXACT twin columns (integer-safe: counts, nearest-rank percentiles) plus
a BOOLEAN error-gate column per sketch (|sketch − exact| within bound).
The DuckDB oracle recomputes the exact columns independently and asserts
the gate literally TRUE — so the driver value-hash checks the exact math
AND trips if a sketch ever drifts outside its bound. The raw sketch
values stay available via ``include_sketch=True`` for the pytest
relative-error gates (tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def token_distinct_profile(
    docs: DataFrame, rsd: float = 0.02, include_sketch: bool = False
) -> DataFrame:
    """Per-language token-vocabulary profile: exact distinct count, total
    token count, and ``hll_ok`` — whether the HLL++ estimate (target
    relative standard deviation ``rsd``) lies within 5% + 2 of the exact
    count (a >2.5-sigma gate at rsd=0.02).

    One explode + one aggregation; at 100 TB you drop the exact column and
    keep the sketch (fixed memory per group vs an O(vocab) hash set).
    ``include_sketch=True`` adds the raw ``hll_distinct`` column (not
    oracle-comparable across engines)."""
    toks = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    prof = toks.groupBy("lang").agg(
        F.countDistinct("tok").alias("exact_distinct"),
        F.approx_count_distinct("tok", rsd).alias("hll_distinct"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    prof = prof.withColumn(
        "hll_ok",
        F.abs(F.col("hll_distinct") - F.col("exact_distinct"))
        <= F.col("exact_distinct") * F.lit(0.05) + F.lit(2),
    )
    if include_sketch:
        return prof
    return prof.select("lang", "exact_distinct", "n_tokens", "hll_ok")


TOKEN_DISTINCT_ORACLE = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT lang,
       COUNT(DISTINCT tok)::BIGINT AS exact_distinct,
       COUNT(*)::BIGINT AS n_tokens,
       TRUE AS hll_ok
FROM toks GROUP BY lang
"""


def token_length_quantiles(
    docs: DataFrame, accuracy: int = 1000, include_sketch: bool = False
) -> DataFrame:
    """Document-length quantile profile per language: NEAREST-RANK exact
    p50/p90/p99 of tokens-per-document (integer-safe — the value at rank
    ceil(p*n), integer arithmetic only, so DuckDB reproduces it bit-for-
    bit) plus ``approx_ok`` — whether each GK-sketch ``percentile_approx``
    value lies within 10% + 3 of its exact twin (GK guarantees rank error
    <= n/accuracy, far tighter than this gate at test scale).

    ``include_sketch=True`` adds the raw ``approx_pct`` array."""
    lens = docs.filter(F.col("text").isNotNull()).select(
        "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    ranked = lens.select(
        "lang",
        "n_tokens",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("n_tokens"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )

    def at(p100: int, name: str):
        # nearest-rank index ceil(p*n) in pure integer arithmetic
        return F.min(
            F.when(
                F.col("rn") == F.expr(f"(n*{p100}+99) DIV 100"),
                F.col("n_tokens"),
            )
        ).alias(name)

    exact = ranked.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        at(50, "p50_tokens"),
        at(90, "p90_tokens"),
        at(99, "p99_tokens"),
    )
    approx = lens.groupBy("lang").agg(
        F.expr(
            f"percentile_approx(n_tokens, array(0.5, 0.9, 0.99), {accuracy})"
        ).alias("approx_pct")
    )
    joined = exact.join(F.broadcast(approx), "lang")
    gate = None
    for i, c in enumerate(["p50_tokens", "p90_tokens", "p99_tokens"]):
        g = F.abs(F.col("approx_pct")[i] - F.col(c)) <= (
            F.col(c) * F.lit(0.10) + F.lit(3)
        )
        gate = g if gate is None else (gate & g)
    joined = joined.withColumn("approx_ok", gate)
    if include_sketch:
        return joined
    return joined.select(
        "lang", "n_docs", "p50_tokens", "p90_tokens", "p99_tokens", "approx_ok"
    )


TOKEN_QUANTILE_ORACLE = """
WITH lens AS (
  SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT lang, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM lens
)
SELECT lang,
       MAX(n)::BIGINT AS n_docs,
       MIN(CASE WHEN rn = (n*50+99)//100 THEN n_tokens END)::BIGINT AS p50_tokens,
       MIN(CASE WHEN rn = (n*90+99)//100 THEN n_tokens END)::BIGINT AS p90_tokens,
       MIN(CASE WHEN rn = (n*99+99)//100 THEN n_tokens END)::BIGINT AS p99_tokens,
       TRUE AS approx_ok
FROM ranked GROUP BY lang
"""
