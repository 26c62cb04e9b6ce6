"""Heterogeneous-source ingest adapters (mehari S13 analog).

Mehari sniffs the SV caller from VCF header quirks and normalizes each
caller's schema onto one record shape (guess_sv_caller,
annotate/strucvars/mod.rs:1284-1512). Our analog: transcript exports arrive
in several vendor shapes; ``sniff_source`` detects the shape from the
columns present and ``normalize_transcripts`` maps each onto the canonical
TRANSCRIPTS_SCHEMA with `when/otherwise` column logic — no UDFs.

Also provides the commented-TSV reader (S10 analog, db/mod.rs:123-158).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# canonical column -> candidate source spellings, in priority order
_COLUMN_ALIASES: dict[str, list[str]] = {
    "conv_id": ["conv_id", "conversation_id", "session_id", "thread_id"],
    "turn_idx": ["turn_idx", "turn_index", "message_idx", "seq"],
    "role": ["role", "speaker", "author_role"],
    "text": ["text", "content", "message", "body"],
    "tool": ["tool", "tool_name", "function_name"],
    "ts": ["ts", "timestamp", "created_at", "event_time"],
}


def sniff_source(df: DataFrame) -> dict[str, str | None]:
    """Detect which source spelling provides each canonical column."""
    cols = set(df.columns)
    mapping: dict[str, str | None] = {}
    for canonical, candidates in _COLUMN_ALIASES.items():
        mapping[canonical] = next((c for c in candidates if c in cols), None)
    return mapping


def normalize_transcripts(df: DataFrame) -> DataFrame:
    """Any recognized vendor shape -> canonical transcripts schema.

    Missing optional columns (tool) become NULL; missing required columns
    raise with the sniffed mapping in the message (fail fast at plan time,
    like mehari's header negotiation, mod.rs:120-268).
    """
    mapping = sniff_source(df)
    required = ["conv_id", "turn_idx", "text"]
    missing = [c for c in required if mapping[c] is None]
    if missing:
        raise ValueError(
            f"unrecognized transcript source: missing {missing}; sniffed {mapping}"
        )
    role_src = mapping["role"]
    role = (
        F.lower(F.col(role_src)) if role_src else F.lit(None).cast("string")
    )
    # vendor role vocabularies -> canonical user/assistant/tool
    role = (
        F.when(role.isin("user", "human", "customer"), "user")
        .when(role.isin("assistant", "ai", "bot", "agent"), "assistant")
        .when(role.isin("tool", "function", "system_tool"), "tool")
        .otherwise(role)
    )
    return df.select(
        F.col(mapping["conv_id"]).cast("string").alias("conv_id"),
        F.col(mapping["turn_idx"]).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col(mapping["text"]).cast("string").alias("text"),
        (
            F.col(mapping["tool"]).cast("string")
            if mapping["tool"]
            else F.lit(None).cast("string")
        ).alias("tool"),
        (
            F.col(mapping["ts"]).cast("timestamp")
            if mapping["ts"]
            else F.lit(None).cast("timestamp")
        ).alias("ts"),
    )


def read_commented_tsv(
    spark: SparkSession, path: str, schema: str, comment: str = "#"
) -> DataFrame:
    """Headered TSV with '#'-comment lines (S10, open_tsv_reader analog)."""
    return (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("comment", comment)
        .schema(schema)
        .csv(path)
    )
