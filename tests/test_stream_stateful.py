"""applyInPandasWithState: per-key state must survive micro-batch
boundaries (running totals keep counting across triggers)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mehari_spark.streaming.sessions import EVENTS_DDL
from mehari_spark.streaming.stateful import stream_running_totals


def _batch(spark, eid0, users_counts):
    rows = []
    eid = eid0
    for user, n in users_counts.items():
        for _ in range(n):
            rows.append((eid, user, "click", 2.0, "{}", datetime(2024, 3, 1, 12, 0)))
            eid += 1
    return spark.createDataFrame(rows, EVENTS_DDL)


class TestStatefulStreaming:
    def test_state_survives_triggers(self, spark, tmp_path):
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ck_dir = str(tmp_path / "ck")

        _batch(spark, 0, {1: 3, 2: 5}).write.mode("append").parquet(in_dir)
        q = stream_running_totals(spark, in_dir, out_dir, ck_dir)
        q.processAllAvailable()
        _batch(spark, 100, {1: 4, 3: 2}).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        out = spark.read.parquet(out_dir)
        # latest row per user = the cumulative totals over BOTH batches
        # order by n_total (monotone cumulative count), not n_batches: the
        # file source may split an append into 1 or 2 micro-batches, so
        # n_batches can tie while n_total cannot
        latest = {
            r.user_id: (r.n_total, r.value_total_c)
            for r in out.withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("user_id")
                    .orderBy(F.desc("n_total"))
                ),
            )
            .filter(F.col("rn") == 1)
            .collect()
        }
        assert latest[1] == (7, 1400)  # 3 + 4 events x value 2.00
        assert latest[2] == (5, 1000)
        assert latest[3] == (2, 400)
        # user 1 was seen in multiple triggers — its later rows prove the
        # state carried earlier triggers' counts forward (the file source
        # may split the two appends into 2+ micro-batches, so assert the
        # monotone prefix property rather than an exact batch split)
        u1 = sorted(r.n_total for r in out.filter(F.col("user_id") == 1).collect())
        assert len(u1) >= 2 and u1[-1] == 7
        assert u1 == sorted(set(u1))  # strictly increasing running totals

    def test_restart_resumes_state(self, spark, tmp_path):
        # state is checkpointed with the query: a restarted query continues
        # the totals instead of starting from zero
        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ck_dir = str(tmp_path / "ck")

        _batch(spark, 0, {7: 2}).write.mode("append").parquet(in_dir)
        q = stream_running_totals(spark, in_dir, out_dir, ck_dir)
        q.processAllAvailable()
        q.stop()

        _batch(spark, 100, {7: 3}).write.mode("append").parquet(in_dir)
        q2 = stream_running_totals(spark, in_dir, out_dir, ck_dir)
        q2.processAllAvailable()
        q2.stop()

        out = spark.read.parquet(out_dir)
        assert out.agg(F.max("n_total")).first()[0] == 5
