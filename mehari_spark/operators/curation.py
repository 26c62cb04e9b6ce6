"""Dataset-assembly operators a training-data pipeline runs AFTER
filtering/dedup: deterministic split assignment, token-budget shard
packing, and benchmark-contamination screening.

All three are pure Catalyst (no Python in the hot path) and
cross-engine deterministic, so each ships a DuckDB oracle:

- ``train_split``: content-hash split (md5 hex prefix compared as a
  string — identical lowercase-hex semantics and binary collation in
  Spark and DuckDB). Hashing CONTENT (not ids) means exact duplicates
  land in the same split — the standard leakage guard — and assignment
  is stable under re-ingestion and cluster size.
- ``shard_packing``: sequential greedy packing of documents into
  ~``budget``-token shards via a cumulative-sum window, partitioned by
  lang so packing parallelizes across groups while staying deterministic
  (a global sequential pack is inherently serial; per-group packing is
  how a 100 TB run shards — one pack stream per partition key). Integer
  arithmetic only.
- ``contamination_screen``: flags documents sharing any word n-gram
  (default 8) with a benchmark corpus — the standard decontamination
  pass before training. Benchmark n-grams are broadcast (a benchmark is
  small by definition); the corpus side streams, so the plan is one
  scan + broadcast join + aggregation at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def train_split(
    docs: DataFrame, train_hex: str = "e6", val_hex: str = "f3"
) -> DataFrame:
    """(doc_id, h2, split): deterministic content-hash split.

    The first two md5 hex chars (256 buckets) compared as strings:
    < ``train_hex`` -> train (default 230/256 ~ 89.8%), < ``val_hex`` ->
    val (13/256 ~ 5.1%), else test."""
    h2 = F.substring(F.md5("text"), 1, 2)
    return docs.select(
        "doc_id",
        h2.alias("h2"),
        F.when(h2 < F.lit(train_hex), "train")
        .when(h2 < F.lit(val_hex), "val")
        .otherwise("test")
        .alias("split"),
    )


TRAIN_SPLIT_ORACLE = """
SELECT doc_id,
       substr(md5(text), 1, 2) AS h2,
       CASE WHEN substr(md5(text), 1, 2) < 'e6' THEN 'train'
            WHEN substr(md5(text), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def shard_packing(docs: DataFrame, budget: int = 20_000) -> DataFrame:
    """(doc_id, lang, n_tokens, shard_id): greedy sequential packing into
    ~``budget``-token shards per lang (shard of a doc = completed budget
    units BEFORE it, so a shard always receives at least one doc and
    overflows by at most one doc — the standard greedy pack)."""
    lens = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(
        W.partitionBy("lang").orderBy("doc_id")
    )
    return lens.withColumn("cum", cum).select(
        "doc_id",
        "lang",
        "n_tokens",
        # integer floor-division only — no float rounding to diverge
        # between engines
        F.expr(f"(cum - n_tokens) DIV {budget}").alias("shard_id"),
    )


SHARD_PACKING_ORACLE = """
SELECT doc_id, lang, n_tokens,
       ((cum - n_tokens) // 20000)::BIGINT AS shard_id
FROM (
  SELECT doc_id, lang,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         SUM(len(string_split(text, ' '))::BIGINT)
           OVER (PARTITION BY lang ORDER BY doc_id) AS cum
  FROM documents
)
"""


def _word_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram): all word n-grams per document (docs shorter than
    n words produce none)."""
    return docs.filter(F.size(F.split("text", " ")) >= n).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                f" i -> array_join(slice(split(text, ' '), i, {n}), ' '))"
            )
        ).alias("gram"),
    )


def contamination_screen(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """(doc_id, n_shared, contaminated) for every non-benchmark doc:
    ``n_shared`` = distinct benchmark word-``n``-grams the doc contains,
    ``contaminated`` = any overlap. Benchmark grams broadcast; the corpus
    side never shuffles its text."""
    bench_ids = benchmark.select("doc_id")
    bench_grams = _word_ngrams(benchmark, n).select("gram").distinct()
    shared = (
        _word_ngrams(docs, n)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
    )
    return (
        docs.select("doc_id")
        .join(bench_ids, "doc_id", "left_anti")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


CONTAMINATION_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[t.i : t.i + 7], ' ') AS gram
  FROM words, unnest(range(1, greatest(len(w) - 6, 1))) AS t(i)
),
bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id < 5
),
shared AS (
  SELECT g.doc_id, COUNT(DISTINCT g.gram)::BIGINT AS n_shared
  FROM grams g JOIN bench USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_shared, 0)::BIGINT AS n_shared,
       COALESCE(s.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN shared s USING (doc_id)
WHERE d.doc_id >= 5
"""
