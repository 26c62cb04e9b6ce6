"""Streaming span-level dedup: arrival-split invariance vs the batch
operator, restart resume, empty epochs, df-cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.operators.spandedup import span_matches_winnowed
from mehari_spark.streaming.replay import write_arrival_chunk
from mehari_spark.streaming.spandedup_stream import (
    applied_epochs,
    read_corpus_texts,
    read_span_matches,
    stream_span_dedup,
)

from .conftest import SF_UNIT

K, W = 24, 8


def _docs(spark):
    return spark.read.parquet(f"{SF_UNIT}/documents.parquet")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run(spark, in_dir, store, ck, mfpt=1, **kw):
    q = stream_span_dedup(
        spark, in_dir, store, ck,
        k=K, w=W, max_files_per_trigger=mfpt, **kw,
    )
    q.awaitTermination()
    return q


class TestStreamSpanDedup:
    def test_multi_wave_equals_batch(self, spark, tmp_path):
        """Three arrival waves: the union of per-epoch spans equals the
        batch winnowed operator over the full corpus — pairs split across
        epochs meet via the index, same-epoch pairs via the batch join."""
        docs = _docs(spark)
        in_dir = str(tmp_path / "in")
        store = str(tmp_path / "store")
        # waves split BY ID RANGE so shared-passage pairs land both within
        # one wave and across waves
        for lo, hi in [(0, 150), (150, 320), (320, 10_000)]:
            write_arrival_chunk(
                docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
                in_dir,
            )
        _run(spark, in_dir, store, str(tmp_path / "ck"))
        got = _sorted_rows(read_span_matches(spark, store))
        want = _sorted_rows(span_matches_winnowed(docs, k=K, w=W))
        assert len(got) > 0
        assert got == want
        # the corpus store carries every doc exactly once
        assert read_corpus_texts(spark, store).count() == docs.count()

    def test_restart_resumes_without_reapplying(self, spark, tmp_path):
        """Stop after wave 1, add wave 2, restart with the SAME checkpoint:
        final spans equal batch; wave-1 epochs applied exactly once."""
        import os

        docs = _docs(spark)
        in_dir = str(tmp_path / "in")
        store = str(tmp_path / "store")
        ck = str(tmp_path / "ck")
        scope = os.path.abspath(ck)
        write_arrival_chunk(docs.where(F.col("doc_id") < 250), in_dir)
        _run(spark, in_dir, store, ck)
        n_first = len(applied_epochs(store, scope))
        assert n_first >= 1
        write_arrival_chunk(docs.where(F.col("doc_id") >= 250), in_dir)
        _run(spark, in_dir, store, ck)
        got = _sorted_rows(read_span_matches(spark, store))
        want = _sorted_rows(span_matches_winnowed(docs, k=K, w=W))
        assert got == want
        assert len(applied_epochs(store, scope)) > n_first

    def test_single_wave_equals_batch(self, spark, tmp_path):
        """Everything in one epoch: the within-batch join alone must
        reproduce the batch operator (no index yet)."""
        docs = _docs(spark).limit(200)
        in_dir = str(tmp_path / "in")
        store = str(tmp_path / "store")
        write_arrival_chunk(docs, in_dir)
        _run(spark, in_dir, store, str(tmp_path / "ck"), mfpt=1_000_000)
        got = _sorted_rows(read_span_matches(spark, store))
        want = _sorted_rows(span_matches_winnowed(docs, k=K, w=W))
        assert got == want

    def test_short_docs_wave_is_harmless(self, spark, tmp_path):
        """A wave of sub-k documents produces no postings and no spans but
        still lands in the corpus store and completes its epoch."""
        spark_docs = spark.createDataFrame(
            [(90001, "tiny", "en", "s", 4), (90002, None, "en", "s", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        in_dir = str(tmp_path / "in")
        store = str(tmp_path / "store")
        write_arrival_chunk(spark_docs, in_dir)
        _run(spark, in_dir, store, str(tmp_path / "ck"))
        assert read_span_matches(spark, store).count() == 0
        assert read_corpus_texts(spark, store).count() == 2

    def test_max_df_cap_applies_per_epoch(self, spark, tmp_path):
        """With max_df=1 every fingerprint seen in >1 doc of a batch is
        dropped from that batch's postings — no within-batch candidates
        survive on a corpus of near-identical docs."""
        import random

        rng = random.Random(5)
        passage = "".join(rng.choice("abcdefgh ") for _ in range(120))
        docs = spark.createDataFrame(
            [(i, passage, "en", "s", len(passage)) for i in range(4)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        in_dir = str(tmp_path / "in")
        store = str(tmp_path / "store")
        write_arrival_chunk(docs, in_dir)
        _run(spark, in_dir, store, str(tmp_path / "ck"),
             mfpt=1_000_000, max_df=1)
        assert read_span_matches(spark, store).count() == 0
