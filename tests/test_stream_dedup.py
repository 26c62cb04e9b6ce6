"""Streaming exact dedup: keep-first across micro-batches AND restarts —
the ingest-side twin of doc_exact_dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.streaming.dedup_stream import DOCS_DDL, stream_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


class TestStreamingDedup:
    def test_keep_first_across_batches_and_restart(self, spark, tmp_path):
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ck = str(tmp_path / "ck")

        # batch 1: x appears twice (doc 1 and 3), y once
        _docs(
            spark, [(1, "en", "text x"), (2, "en", "text y"), (3, "en", "text x")]
        ).write.mode("append").parquet(in_dir)
        q = stream_dedup(spark, in_dir, out_dir, ck)
        q.processAllAvailable()
        # batch 2: x again (dup), z new
        _docs(spark, [(4, "en", "text x"), (5, "en", "text z")]).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        q.stop()
        # restart: y again — state must survive the restart
        _docs(spark, [(6, "en", "text y")]).write.mode("append").parquet(in_dir)
        q2 = stream_dedup(spark, in_dir, out_dir, ck)
        q2.processAllAvailable()
        q2.stop()

        out = spark.read.parquet(out_dir)
        kept = {
            r.text_hash: r.first_doc_id for r in out.filter("is_new").collect()
        }
        # exactly one is_new row per distinct text; first copy kept
        assert len(kept) == 3
        assert sorted(kept.values()) == [1, 2, 5]
        # the restarted sighting of y is a dup verdict, not a new one
        dup_rows = out.filter(~F.col("is_new")).collect()
        assert any(r.first_doc_id == 2 and r.n_seen == 2 for r in dup_rows)
        # x's final running count: docs 1, 3, 4
        x_rows = sorted(
            (r.n_seen for r in out.collect() if r.first_doc_id == 1)
        )
        assert x_rows[-1] == 3

    def test_agrees_with_batch_exact_dedup(self, spark, tmp_path):
        from mehari_spark.operators.dedup import exact_dedup_groups

        from .conftest import SF_UNIT

        docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet").limit(200)
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ck = str(tmp_path / "ck")
        # replay the static corpus as two arbitrary chunks
        docs.filter(F.col("doc_id") < 100).select(
            "doc_id", "lang", "text"
        ).write.mode("append").parquet(in_dir)
        q = stream_dedup(spark, in_dir, out_dir, ck)
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= 100).select(
            "doc_id", "lang", "text"
        ).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        streamed = {
            (r.text_hash, r.first_doc_id)
            for r in spark.read.parquet(out_dir).filter("is_new").collect()
        }
        batch = {
            (r.text_hash, r.min_doc_id) for r in exact_dedup_groups(docs).collect()
        }
        assert streamed == batch