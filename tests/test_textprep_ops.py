"""Planted-input semantics for the text curation extensions
(operators/textstats.py: pii_scrub, tfidf_topterms, repetition_profile)."""

from __future__ import annotations

import pytest

from mehari_spark.operators.textstats import (
    pii_scrub,
    repetition_profile,
    tfidf_topterms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_scrub_planted(spark):
    df = _docs(
        spark,
        [
            (1, "reach me at alice.smith+x@example.co.uk or bob@test.io ok"),
            (2, "call 415-555-0199 or 212-555-0000 today"),
            (3, "clean text no pii here"),
            (4, "mixed a@b.com and 333-444-5555 in one doc"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_phones"] == 0
    assert "[EMAIL]" in got[1]["scrubbed"] and "@" not in got[1]["scrubbed"]
    assert got[2]["n_phones"] == 2
    assert got[2]["scrubbed"] == "call [PHONE] or [PHONE] today"
    assert got[3]["n_emails"] == 0 and got[3]["n_phones"] == 0
    assert got[3]["scrubbed"] == "clean text no pii here"
    assert got[4]["n_emails"] == 1 and got[4]["n_phones"] == 1


def test_tfidf_rare_term_outranks_common(spark):
    # "zebra" appears once in doc 1 only; "common" appears in all docs —
    # idf must put zebra on top for doc 1 even at equal tf
    df = _docs(
        spark,
        [
            (1, "common zebra common alpha alpha"),
            (2, "common beta beta"),
            (3, "common gamma"),
            (4, "common delta"),
        ],
    )
    out = tfidf_topterms(df, k=2).collect()
    doc1 = sorted(
        [r for r in out if r["doc_id"] == 1], key=lambda r: -r["score"]
    )
    terms1 = [r["term"] for r in doc1]
    # alpha: tf=2, df=1 -> 2*4000; zebra: tf=1, df=1 -> 4000;
    # common: tf=2, df=4 -> 2*1000 — alpha then zebra, common out of top-2
    assert terms1 == ["alpha", "zebra"]
    assert doc1[0]["score"] == 8000 and doc1[1]["score"] == 4000
    # every doc emits at most k rows
    from collections import Counter

    assert max(Counter(r["doc_id"] for r in out).values()) <= 2


def test_repetition_profile_planted(spark):
    df = _docs(
        spark,
        [
            # "a b c" repeated 4x -> heavy 3-gram duplication
            (1, "a b c a b c a b c a b c"),
            # all-distinct tokens -> zero duplicate 3-grams
            (2, "one two three four five six"),
            # too short for any 3-gram
            (3, "x y"),
        ],
    )
    got = {r["doc_id"]: r for r in repetition_profile(df, n=3).collect()}
    r1 = got[1]
    assert r1["n_tokens"] == 12 and r1["n_distinct"] == 3
    assert r1["distinct_milli"] == 250
    # 10 total 3-grams: "a b c" x4, "b c a" x3, "c a b" x3 — all duplicated
    assert r1["top_ngram_n"] == 4
    assert r1["dup_ngram_milli"] == 1000
    r2 = got[2]
    assert r2["n_tokens"] == 6 and r2["n_distinct"] == 6
    assert r2["distinct_milli"] == 1000
    assert r2["top_ngram_n"] == 1 and r2["dup_ngram_milli"] == 0
    r3 = got[3]
    assert r3["n_tokens"] == 2
    assert r3["top_ngram_n"] == 0 and r3["dup_ngram_milli"] == 0


def test_registry_pii_injection_exercises_redaction(spark):
    """The registry's doc_pii_scrub entry must actually hit the redaction
    path on the shared corpus (injected PII present and scrubbed)."""
    from mehari_spark.plans.queries import QUERIES

    fn, oracle = QUERIES["doc_pii_scrub"]
    pdf = fn(spark, "/root/testdata/sf0.001").toPandas()
    assert pdf["n_emails"].sum() > 0
    assert pdf["n_phones"].sum() > 0
    assert pdf[pdf["n_emails"] > 0]["scrubbed"].str.contains("EMAIL").all()
