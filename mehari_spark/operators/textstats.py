"""Text analysis for training-data pipelines: quality, tokens, lang-id,
fingerprints.

All hot-path scoring is built-in Catalyst expressions (whole-stage codegen);
the winnowing fingerprint is the one pandas-UDF step (pure-integer kernel in
kernels/fingerprint.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.fingerprint import fingerprint

STOPWORDS = ("the", "a")


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality stats: token count, distinct ratio, stopword ratio,
    mean token length — integer/rounded outputs for stable hashing."""
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    # stopword OCCURRENCES (not distinct), so filter+size rather than intersect
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        n_stop.alias("n_stopwords"),
        F.round((F.length("text") - F.size(toks) + 1) / F.size(toks), 4).alias(
            "avg_token_len"
        ),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 4
        ).alias("distinct_ratio"),
    )


def token_topk(docs: DataFrame, k: int = 25) -> DataFrame:
    """Global token frequencies, top-k by (count desc, token asc)."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


# fixed per-language marker-token profiles for the n-gram/keyword heuristic
# language identifier (deterministic; a real deployment would broadcast
# trained char-n-gram profiles — same plumbing, different table)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "small"),
    "de": ("batch", "slow", "window"),
    "fr": ("merge", "vector", "column"),
    "es": ("join", "stream", "value"),
    "zh": ("hash", "scan", "query"),
}


def lang_id(docs: DataFrame) -> DataFrame:
    """Keyword-profile language ID: argmax over marker-token hit counts.

    Expressed as a broadcast join against the marker table + groupBy argmax
    (max_by) — no UDF. Deterministic tie-break by language code.
    """
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, m) for lang, ms in LANG_MARKERS.items() for m in ms],
        "cand_lang string, marker string",
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    hits = (
        toks.join(F.broadcast(markers), toks.token == markers.marker)
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    # deterministic argmax: order by (hits desc, cand_lang asc) via window
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("cand_lang"))
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "hits")
    )


def _fingerprint_rows(
    it: Iterable[pd.DataFrame], k: int, w: int
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids: list[int] = []
        fps: list[int] = []
        for doc_id, txt in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
            for h in fingerprint(txt or "", k=k, w=w):
                ids.append(doc_id)
                fps.append(h & 0x7FFFFFFFFFFFFFFF)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "fp": pd.Series(fps, dtype="int64"),
            }
        )


def doc_fingerprints(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing fingerprints: (doc_id, fp) rows — join fp to find overlap."""
    return docs.select("doc_id", "text").mapInPandas(
        lambda it: _fingerprint_rows(it, k, w), schema="doc_id long, fp long"
    )


def quality_reasons(text_col):
    """The quality-gate reasons BITMASK as a reusable Column expression —
    shared by the batch filter and the streaming ingest pipeline so both
    gates are definitionally identical. Pure Catalyst, stream-safe."""
    toks = F.split(text_col, " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return (
        F.when(n_tokens < 10, 1).otherwise(0)
        + F.when(n_tokens > 1000, 2).otherwise(0)
        + F.when(100 * n_distinct < 20 * n_tokens, 4).otherwise(0)
        + F.when(n_stop == 0, 8).otherwise(0)
    ).cast("int")


def quality_filter(docs: DataFrame) -> DataFrame:
    """Gopher-style pretraining quality filter: every doc gets a reasons
    BITMASK (the hard/soft Reason-enum discipline of mehari's dictionary
    build, db/transcripts/create/models.rs:65-108) plus the kept verdict.

    Rules (integer-exact so the DuckDB oracle hashes identically):
      bit 1 — too few tokens        (n_tokens < 10)
      bit 2 — too many tokens       (n_tokens > 1000)
      bit 4 — low distinct ratio    (100 * n_distinct < 20 * n_tokens)
      bit 8 — no stopword           (n_stopwords == 0)
    kept = reasons == 0. Pure Catalyst expressions, one narrow pass.
    """
    reasons = quality_reasons(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        reasons.alias("filter_reasons"),
        (reasons == 0).alias("kept"),
    )
