"""Streaming near-dup (MinHash-LSH) dedup: agreement with the batch LSH
path, transitive-chain keep-first, and keep-first across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.streaming.neardup_stream import (
    DOCS_DDL,
    read_verdicts,
    stream_neardup_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def _near_text(base: str, i: int) -> str:
    """base text with one token appended — high-Jaccard near-dup of base."""
    return base + f" v{i}"


class TestStreamingNearDup:
    def test_agrees_with_batch_lsh_verdicts(self, spark, tmp_path):
        """The streaming dropped set == {doc_b of batch minhash_lsh_pairs}
        on a real corpus fed in doc_id order (two chunks)."""
        from mehari_spark.operators.dedup import minhash_lsh_pairs

        from .conftest import SF_UNIT

        docs = (
            spark.read.parquet(f"{SF_UNIT}/documents.parquet")
            .select("doc_id", "lang", "text")
            .limit(300)
        )
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        docs.filter(F.col("doc_id") < 150).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.9)
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= 150).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        streamed_dropped = {
            r.doc_id for r in read_verdicts(spark, out_dir).filter("NOT is_new").collect()
        }
        batch_dropped = {
            r.doc_b
            for r in minhash_lsh_pairs(docs, threshold=0.9).select("doc_b").collect()
        }
        assert streamed_dropped == batch_dropped
        # every doc got exactly one verdict row
        assert read_verdicts(spark, out_dir).count() == docs.count()

    def test_transitive_chain_and_dup_of(self, spark, tmp_path):
        """A~B and B~C but A!~C: B and C both dropped (dropped docs stay in
        the seen set), and dup_of points at the earliest similar doc."""
        base = " ".join(f"tok{i}" for i in range(40))
        a = base
        b = base + " x1 x2"          # J(a,b) = 40/42 ~ 0.952
        c = base + " x1 x2 x3 x4"    # J(b,c) = 42/44 ~ 0.955, J(a,c) = 40/44 ~ 0.909
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(1, "en", a)]).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q.processAllAvailable()
        _docs(spark, [(2, "en", b)]).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        _docs(spark, [(3, "en", c)]).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        rows = {r.doc_id: r for r in read_verdicts(spark, out_dir).collect()}
        assert rows[1].is_new
        assert not rows[2].is_new and rows[2].dup_of == 1
        # C only matches B (J >= 0.95) — the dropped B still caught it
        assert not rows[3].is_new and rows[3].dup_of == 2

    def test_keep_first_across_restart(self, spark, tmp_path):
        """State survives a stop/restart: a post-restart near-dup of a
        pre-restart doc is dropped, a novel doc is kept — exactly once."""
        base = " ".join(f"w{i}" for i in range(50))
        other = " ".join(f"z{i}" for i in range(50))
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(1, "en", base), (2, "en", other)]).write.mode(
            "append"
        ).parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q.processAllAvailable()
        q.stop()
        # restart: near-dup of doc 1, near-dup of doc 2, one novel doc
        novel = " ".join(f"q{i}" for i in range(50))
        _docs(
            spark,
            [
                (3, "en", _near_text(base, 1)),
                (4, "en", _near_text(other, 2)),
                (5, "en", novel),
            ],
        ).write.mode("append").parquet(in_dir)
        q2 = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q2.processAllAvailable()
        q2.stop()

        rows = {r.doc_id: (r.is_new, r.dup_of) for r in read_verdicts(spark, out_dir).collect()}
        assert rows == {
            1: (True, None),
            2: (True, None),
            3: (False, 1),
            4: (False, 2),
            5: (True, None),
        }
