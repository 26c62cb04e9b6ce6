"""Cross-document span-level exact substring dedup.

Doc-level exact dedup removes identical documents and MinHash removes
near-identical ones, but web corpora are full of *shared passages*
(boilerplate, quoted text, license blocks) embedded in otherwise-distinct
documents — the standard LLM-data stage that removes them works at the
substring level (suffix-array / fingerprint-inverted-index style). Two
paths, cross-asserted:

1. EXACT (oracle twin): every k-gram posting (doc, pos, gram), self-join
   on the gram, and maximal shared spans recovered with the
   gaps-and-islands trick — matched positions along one (doc_a, doc_b,
   pos_a - pos_b) diagonal with consecutive pos_a form one island, and
   each island IS one character-maximal shared span (gram equality is
   string equality, so a non-extendable gram run is a non-extendable
   character span). Pure Catalyst: explode + substring + self-join +
   one window. The DuckDB oracle is the same algebra.

2. WINNOWED (the 100 TB path): the winnowing fingerprint index
   (kernels/fingerprint.py, Schleimer et al. SIGMOD'03) stores only
   ~2/(w+1) of the grams as (doc, pos, fp) postings; candidates come
   from the fp equi-join (bucketed by fingerprint — never all-pairs),
   then each candidate seed is VERIFIED against the actual texts and
   extended to its character-maximal span (grouped Arrow kernel per doc
   pair — the same re-rank shape as MinHash). The winnowing guarantee
   (any shared span of length >= w + k - 1 selects at least one common
   in-span fingerprint in both documents) makes this path EXACT for
   spans at or above the threshold, so its registry entry carries a full
   DuckDB oracle: the exact twin filtered to span_len >= k + w - 1.

Skew/scale notes: a boilerplate gram shared by millions of documents
makes its posting list — and the equi-join fan-out — quadratic in its
document frequency; ``max_df`` drops postings of grams/fingerprints seen
in more than that many documents (they are non-discriminative for
dedup), the standard winnowing-index mitigation. Reference discipline:
seen-keys dedup across parallel windows
(/root/reference/mehari/src/db/mod.rs:208-309).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..kernels.fingerprint import fingerprint_postings

# ---------------------------------------------------------------------------
# exact k-gram postings (pure Catalyst)
# ---------------------------------------------------------------------------


def gram_postings(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, gram): every character k-gram of every document,
    1-based start position. Documents shorter than k emit nothing
    (sequence() is guarded — Spark's sequence(1, 0) would count DOWN)."""
    n_grams = F.length("text") - F.lit(k - 1)
    positions = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return docs.select(
        "doc_id", F.explode(positions).alias("pos"), F.col("text")
    ).select("doc_id", "pos", F.substring("text", F.col("pos"), k).alias("gram"))


def _df_capped(postings: DataFrame, key: str, max_df: int | None) -> DataFrame:
    """Drop postings whose key appears in more than ``max_df`` distinct
    documents — bounds the equi-join fan-out under boilerplate skew."""
    if max_df is None:
        return postings
    hot = (
        postings.groupBy(key)
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") > max_df)
        .select(key)
    )
    return postings.join(F.broadcast(hot), key, "left_anti")


def span_dup_mass(docs: DataFrame, k: int = 16) -> DataFrame:
    """(doc_id, n_grams, dup_grams, dup_permille): per-document duplicated
    span mass — how many of the doc's k-gram positions carry a gram that
    also appears in at least one OTHER document. The corpus-level signal
    the span-dedup stage thresholds on (drop/trim docs that are mostly
    shared passages). Shuffles: one gram agg + one join back + one doc
    agg — O(total grams), never pairwise."""
    g = gram_postings(docs, k)
    nd = g.groupBy("gram").agg(F.count_distinct("doc_id").alias("nd"))
    return (
        g.join(nd, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_grams"),
        )
        .withColumn(
            "dup_permille", F.expr("dup_grams * 1000 DIV n_grams").cast("long")
        )
    )


def span_matches(
    docs: DataFrame, k: int = 24, max_df: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, span_len): every character-maximal
    shared substring of length >= k between distinct documents
    (doc_a < doc_b), exact.

    Gaps-and-islands over the gram-match relation: matches on one
    (doc_a, doc_b, diag=pos_a-pos_b) diagonal with consecutive pos_a are
    one maximal span; span_len = max(pos_a) - min(pos_a) + k. One
    self-join shuffle on the gram + one window shuffle on the pair."""
    g = _df_capped(gram_postings(docs, k), "gram", max_df)
    a, b = g.alias("a"), g.alias("b")
    m = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.pos").alias("pos_b"),
    )
    m = m.withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    m = m.withColumn("isl", F.col("pos_a") - F.row_number().over(w))
    return m.groupBy("doc_a", "doc_b", "diag", "isl").agg(
        F.min("pos_a").cast("long").alias("start_a"),
        F.min("pos_b").cast("long").alias("start_b"),
        (F.max("pos_a") - F.min("pos_a") + k).cast("long").alias("span_len"),
    ).select("doc_a", "doc_b", "start_a", "start_b", "span_len")


# ---------------------------------------------------------------------------
# winnowed inverted index + verify-and-extend (the scale path)
# ---------------------------------------------------------------------------


def _posting_rows(
    it: Iterable[pd.DataFrame], k: int, w: int
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids: list[int] = []
        poss: list[int] = []
        fps: list[int] = []
        for doc_id, txt in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
            for pos, h in fingerprint_postings(txt or "", k=k, w=w):
                ids.append(doc_id)
                poss.append(pos)
                fps.append(h)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int32"),
                "fp": pd.Series(fps, dtype="int64"),
            }
        )


def winnowed_postings(docs: DataFrame, k: int = 24, w: int = 8) -> DataFrame:
    """(doc_id, pos, fp): position-aware winnowing fingerprints — the
    inverted-index payload, ~2/(w+1) the size of the full gram index."""
    return docs.select("doc_id", "text").mapInPandas(
        lambda it: _posting_rows(it, k, w), schema="doc_id long, pos int, fp long"
    )


def _extend_span(ta: str, tb: str, pa: int, pb: int, k: int):
    """Verify the k-gram seed at 1-based (pa, pb) and extend it to the
    character-maximal shared span; None if the seed is a hash collision."""
    i, j = pa - 1, pb - 1
    if ta[i : i + k] != tb[j : j + k]:
        return None
    ea, eb = i + k, j + k
    while i > 0 and j > 0 and ta[i - 1] == tb[j - 1]:
        i -= 1
        j -= 1
    la, lb = len(ta), len(tb)
    while ea < la and eb < lb and ta[ea] == tb[eb]:
        ea += 1
        eb += 1
    return (i + 1, j + 1, ea - i)


def _verify_extend_pdf(pdf: pd.DataFrame, k: int, min_len: int) -> pd.DataFrame:
    """One (doc_a, doc_b) group: verify each candidate seed against the
    texts, extend to maximal, dedupe spans, threshold on min_len."""
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=["doc_a", "doc_b", "start_a", "start_b", "span_len"]
        )
    ta = pdf["text_a"].iloc[0] or ""
    tb = pdf["text_b"].iloc[0] or ""
    doc_a = int(pdf["doc_a"].iloc[0])
    doc_b = int(pdf["doc_b"].iloc[0])
    spans = set()
    for pa, pb in zip(pdf["pos_a"].tolist(), pdf["pos_b"].tolist()):
        ext = _extend_span(ta, tb, int(pa), int(pb), k)
        if ext is not None and ext[2] >= min_len:
            spans.add(ext)
    out = sorted(spans)
    return pd.DataFrame(
        {
            "doc_a": pd.Series([doc_a] * len(out), dtype="int64"),
            "doc_b": pd.Series([doc_b] * len(out), dtype="int64"),
            "start_a": pd.Series([s[0] for s in out], dtype="int64"),
            "start_b": pd.Series([s[1] for s in out], dtype="int64"),
            "span_len": pd.Series([s[2] for s in out], dtype="int64"),
        }
    )


def span_matches_winnowed(
    docs: DataFrame, k: int = 24, w: int = 8, max_df: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, span_len): character-maximal shared
    substrings of length >= k + w - 1, found through the winnowed
    fingerprint index — EXACT above that threshold (winnowing guarantee),
    which is why this entry carries the full exact-twin oracle.

    Plan shape: fp equi-join over ~2/(w+1)-sized postings (the only big
    shuffle), candidate pairs joined back to the two texts, then one
    grouped Arrow kernel per (doc_a, doc_b) verifies seeds against the
    real characters (hash collisions die here) and extends each to its
    maximal span. Never all-pairs; ``max_df`` bounds boilerplate-key
    fan-out at corpus scale."""
    min_len = k + w - 1
    p = _df_capped(winnowed_postings(docs, k, w), "fp", max_df)
    a, b = p.alias("a"), p.alias("b")
    cand = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.pos").alias("pos_b"),
    )
    texts = docs.select("doc_id", "text")
    cand = cand.join(
        texts.select(
            F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
        ),
        "doc_a",
    ).join(
        texts.select(
            F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
        ),
        "doc_b",
    )
    return cand.groupBy("doc_a", "doc_b").applyInPandas(
        lambda _key, pdf: _verify_extend_pdf(pdf, k, min_len),
        schema="doc_a long, doc_b long, start_a long, start_b long, span_len long",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generators (exact twins on the documents view)
# ---------------------------------------------------------------------------

# series bound: documents.text tops out well under this at oracle scale
# (sf0.01 max ~560 chars); the driver never runs oracles above sf0.01
_MAX_LEN = 8192


def _grams_cte(k: int) -> str:
    return f"""idx AS (SELECT i FROM generate_series(1, {_MAX_LEN}) t(i)),
grams AS (
  SELECT d.doc_id, i.i AS pos, substr(d.text, i.i, {k}) AS gram
  FROM documents d JOIN idx i ON i.i <= length(d.text) - {k - 1}
)"""


def span_dup_mass_oracle(k: int = 16) -> str:
    return f"""WITH {_grams_cte(k)},
gd AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
SELECT g.doc_id,
       COUNT(*)::BIGINT AS n_grams,
       SUM(CASE WHEN gd.nd > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_grams,
       (SUM(CASE WHEN gd.nd > 1 THEN 1 ELSE 0 END) * 1000
        // COUNT(*))::BIGINT AS dup_permille
FROM grams g JOIN gd USING (gram)
GROUP BY g.doc_id"""


def span_matches_oracle(k: int = 24, min_len: int | None = None) -> str:
    threshold = "" if min_len is None else f"\nHAVING MAX(pos_a) - MIN(pos_a) + {k} >= {min_len}"
    return f"""WITH {_grams_cte(k)},
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT *, pos_a - ROW_NUMBER() OVER (
    PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS isl
  FROM m
)
SELECT doc_a, doc_b,
       MIN(pos_a)::BIGINT AS start_a,
       MIN(pos_b)::BIGINT AS start_b,
       (MAX(pos_a) - MIN(pos_a) + {k})::BIGINT AS span_len
FROM r
GROUP BY doc_a, doc_b, pos_a - pos_b, isl{threshold}"""
