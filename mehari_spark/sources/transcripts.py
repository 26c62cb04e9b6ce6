"""Deterministic transcripts table (BASELINE.json input_hint shape).

The driver ships deterministic synthetic ``documents`` parquet; we derive the
multi-turn agent-transcript table — (conv_id, turn_idx, role, text, tool, ts)
— from it with pure built-in expressions, so the DuckDB oracle can reproduce
it exactly (see TRANSCRIPTS_ORACLE_CTE). One document = one conversation;
every TURN_TOKENS tokens of the document = one turn; roles cycle
user/assistant/tool; ts is monotone within a conversation (the
coordinate-sorted-input contract of mehari, compound.rs:54-60).

All expressions are Catalyst built-ins — the derivation is a narrow map over
the scan (no shuffle), and the 100 TB version is simply `spark.read.table`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURN_TOKENS = 16
TS_BASE = "2024-01-01 00:00:00"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def derive_transcripts(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    w = F.split(F.col("text"), " ")
    n_turns = F.ceil(F.size(w) / F.lit(TURN_TOKENS)).cast("int")
    return (
        docs.select(F.col("doc_id"), w.alias("w"), n_turns.alias("n_turns"))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .select(
            F.concat(
                F.lit("conv_"), F.lpad(F.col("doc_id").cast("string"), 8, "0")
            ).alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                F.pmod(F.col("turn_idx"), F.lit(3)) + 1,
            ).alias("role"),
            F.array_join(
                F.slice(F.col("w"), F.col("turn_idx") * TURN_TOKENS + 1, TURN_TOKENS),
                " ",
            ).alias("text"),
            F.when(F.pmod(F.col("turn_idx"), F.lit(3)) == 2, F.lit("search")).alias(
                "tool"
            ),
            (
                F.to_timestamp(F.lit(TS_BASE))
                + F.make_interval(secs=F.col("doc_id") * 3600 + F.col("turn_idx") * 60)
            ).alias("ts"),
        )
    )


def transcripts(
    spark: SparkSession, sf_dir: str, spread: int | str | None = None
) -> DataFrame:
    """``spread`` repartitions the (single-file) documents source before the
    derivation so downstream map stages parallelize — the 100 TB input is
    thousands of Iceberg files and needs no such help.

    ``spread="auto"`` balances ONLY when the scan yields fewer splits than
    ``defaultParallelism`` (the local testdata parquet is a single row
    group, so every downstream kernel would otherwise run in one task —
    the unsplittable-input case of the optimization guide §2.5); at
    cluster scale the scan already has >= cores splits and this is a
    no-op, so the knob is scale-adaptive rather than local-tuned."""
    docs = load_documents(spark, sf_dir)
    if spread == "auto":
        par = spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par)
    elif spread:
        docs = docs.repartition(spread)
    return derive_transcripts(docs)


# The DuckDB-side mirror of derive_transcripts(); prepend to oracle SQL.
TRANSCRIPTS_ORACLE_CTE = f"""
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
turns AS (
  SELECT
    'conv_' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
    CAST(i AS INTEGER) AS turn_idx,
    CASE CAST(i % 3 AS INTEGER) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    array_to_string(w[CAST(i * {TURN_TOKENS} + 1 AS BIGINT):CAST(i * {TURN_TOKENS} + {TURN_TOKENS} AS BIGINT)], ' ') AS text,
    CASE WHEN CAST(i % 3 AS INTEGER) = 2 THEN 'search' ELSE NULL END AS tool,
    TIMESTAMP '{TS_BASE}' + to_seconds(doc_id * 3600 + i * 60) AS ts
  FROM words, unnest(generate_series(0, CAST(ceil(len(w) / {TURN_TOKENS}.0) AS BIGINT) - 1)) AS g(i)
)
"""
