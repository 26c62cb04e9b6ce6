"""Streaming ingest: the fused kernel over readStream must produce the same
triples as the batch path, and resume its checkpoint across restarts."""

from __future__ import annotations

import os

from mehari_spark.datagen import (
    fixture_patterns,
    reference_triples,
    synth_transcripts,
    turns_df,
)
from mehari_spark.streaming.stream_pipeline import stream_triples


def _key_set(df):
    return {
        (r.conv_id, r.turn_idx, r.subj_id, r.pred_id, r.obj_id) for r in df.collect()
    }


class TestStreaming:
    def test_stream_matches_batch_and_resumes(self, spark, tmp_path):
        turns = synth_transcripts(seed=7, n_convs=10, turns_per_conv=6)
        golden = reference_triples(turns, fixture_patterns())
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ck_dir = str(tmp_path / "ck")
        half = len(turns) // 2

        # first batch of files lands
        turns_df(spark, turns[:half]).write.mode("append").parquet(in_dir)
        q = stream_triples(spark, in_dir, out_dir, ck_dir, fixture_patterns())
        q.processAllAvailable()
        q.stop()
        got1 = _key_set(spark.read.parquet(out_dir))
        assert got1 == reference_triples(turns[:half], fixture_patterns())

        # restart the stream; second batch lands; checkpoint must dedupe
        turns_df(spark, turns[half:]).write.mode("append").parquet(in_dir)
        q2 = stream_triples(spark, in_dir, out_dir, ck_dir, fixture_patterns())
        q2.processAllAvailable()
        q2.stop()
        got2 = _key_set(spark.read.parquet(out_dir))
        assert got2 == golden
        # no duplicate rows from reprocessing already-committed files
        total = spark.read.parquet(out_dir).count()
        assert total == len(golden)

    def test_retried_epoch_is_idempotent(self, spark, tmp_path):
        # a driver crash AFTER the sink write but BEFORE the epoch commits to
        # checkpointLocation makes Structured Streaming re-run the SAME
        # epoch_id on restart; the epoch-keyed overwrite must not duplicate.
        from mehari_spark.streaming.stream_pipeline import write_epoch

        turns = synth_transcripts(seed=11, n_convs=5, turns_per_conv=4)
        from mehari_spark.operators.triples import extract_triples_fused

        triples = extract_triples_fused(
            turns_df(spark, turns), fixture_patterns()
        )
        out_dir = str(tmp_path / "epochs")
        write_epoch(triples, 7, out_dir)          # first (uncommitted) attempt
        first = spark.read.parquet(out_dir).count()
        write_epoch(triples, 7, out_dir)          # the retry after the crash
        assert spark.read.parquet(out_dir).count() == first
        # a partial first attempt is also repaired, not merged
        write_epoch(triples.limit(1), 8, out_dir)  # "partial" epoch 8
        write_epoch(triples, 8, out_dir)           # full retry of epoch 8
        assert spark.read.parquet(out_dir).count() == 2 * first
