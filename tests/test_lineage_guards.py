"""Checkpointed-write edge cases: empty staged input, bucketing mismatch."""

from __future__ import annotations

import pytest

from mehari_spark.plans.lineage import load_committed, read_bucketed, write_bucketed


def _df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, v long")


class TestWriteBucketedGuards:
    def test_empty_input_commits_zero_row_buckets(self, spark, tmp_path):
        out = str(tmp_path / "empty")
        results = write_bucketed(
            _df(spark, []), out, "r1", key_col="conv_id", n_buckets=4
        )
        assert len(results) == 4
        assert all(r.rows_out == 0 and not r.skipped for r in results)
        # restart sees all 4 committed and does nothing
        assert load_committed(out) == {0, 1, 2, 3}
        results2 = write_bucketed(
            _df(spark, [("a", 1)]), out, "r2", key_col="conv_id", n_buckets=4
        )
        assert all(r.skipped for r in results2)

    def test_n_buckets_mismatch_fails_fast(self, spark, tmp_path):
        out = str(tmp_path / "mismatch")
        write_bucketed(
            _df(spark, [("a", 1), ("b", 2)]), out, "r1", key_col="conv_id", n_buckets=4
        )
        with pytest.raises(ValueError, match="n_buckets=4"):
            write_bucketed(
                _df(spark, [("c", 3)]), out, "r2", key_col="conv_id", n_buckets=8
            )

    def test_key_col_mismatch_fails_fast(self, spark, tmp_path):
        out = str(tmp_path / "keymismatch")
        write_bucketed(
            _df(spark, [("a", 1)]), out, "r1", key_col="conv_id", n_buckets=2
        )
        with pytest.raises(ValueError, match="key_col"):
            write_bucketed(
                _df(spark, [("b", 2)]), out, "r2", key_col="v", n_buckets=2
            )

    def test_same_config_resumes_cleanly(self, spark, tmp_path):
        out = str(tmp_path / "resume")
        write_bucketed(
            _df(spark, [("a", 1), ("b", 2), ("c", 3)]),
            out,
            "r1",
            key_col="conv_id",
            n_buckets=2,
        )
        results = write_bucketed(
            _df(spark, [("a", 1)]), out, "r2", key_col="conv_id", n_buckets=2
        )
        assert all(r.skipped for r in results)
        assert read_bucketed(spark, out).count() == 3
