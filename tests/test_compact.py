"""Bucket compaction: content-identical rewrite, small-file reduction,
crash-atomic swap + repair, idempotent re-run."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from mehari_spark.plans.compact import compact_buckets
from mehari_spark.plans.lineage import read_bucketed, write_bucketed
from mehari_spark.plans.merge import repair_interrupted_merge


def _table(spark, tmp_path, n=4000, n_buckets=4):
    out = str(tmp_path / "tbl")
    df = spark.range(n).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 97).alias("v"),
    )
    # many staging tasks -> many small files per bucket
    write_bucketed(
        df.repartition(16), out, run_id="r1", key_col="conv_id", n_buckets=n_buckets
    )
    return out


def _files_per_bucket(out):
    return {
        os.path.basename(d): len(glob.glob(os.path.join(d, "*.parquet")))
        for d in glob.glob(os.path.join(out, "bucket=*"))
        if not d.endswith(".old")
    }


class TestCompaction:
    def test_compacts_to_single_sorted_file_same_content(self, spark, tmp_path):
        out = _table(spark, tmp_path)
        before = sorted(map(tuple, read_bucketed(spark, out).collect()))
        fb = _files_per_bucket(out)
        assert all(nf > 1 for nf in fb.values())  # test premise: small files

        res = compact_buckets(spark, out, sort_cols=["conv_id"])
        assert sorted(res["compacted"]) == [0, 1, 2, 3]
        fa = _files_per_bucket(out)
        assert all(nf == 1 for nf in fa.values())
        after = sorted(map(tuple, read_bucketed(spark, out).collect()))
        assert after == before  # byte-level layout changed, content didn't
        # checkpoint log carries one compacted row per bucket
        with open(os.path.join(out, "_checkpoints.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert sum(1 for r in recs if r.get("status") == "compacted") == 4

    def test_rerun_skips_when_compact(self, spark, tmp_path):
        out = _table(spark, tmp_path)
        compact_buckets(spark, out)
        res2 = compact_buckets(spark, out)
        assert not res2["compacted"] and sorted(res2["skipped"]) == [0, 1, 2, 3]

    def test_crash_mid_swap_repairs(self, spark, tmp_path):
        out = _table(spark, tmp_path)
        before = sorted(map(tuple, read_bucketed(spark, out).collect()))
        with pytest.raises(RuntimeError, match="injected crash"):
            compact_buckets(spark, out, fail_mid_swap_bucket=2)
        # bucket=2 is renamed aside; the repair protocol restores it
        assert os.path.exists(os.path.join(out, "bucket=2.old"))
        repair_interrupted_merge(out)
        assert not os.path.exists(os.path.join(out, "bucket=2.old"))
        assert sorted(map(tuple, read_bucketed(spark, out).collect())) == before
        # and a fresh compaction completes the job
        res = compact_buckets(spark, out)
        assert 2 in res["compacted"]
        assert sorted(map(tuple, read_bucketed(spark, out).collect())) == before
