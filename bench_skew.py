"""Measured hot-key skew demo (north_rule P15: measured, not assumed).

Injects ONE synthetic hot conversation (HOT_TURNS turns, default 1M) into
the replicated sf0.1 transcripts, then runs the windowed-path scan stage
(partition_for_scan -> AC mention scan) twice — salting OFF vs ON — and
reports wall time plus the max/mean partition row counts after the
repartition. Without salting the hot conversation pins one partition and
the stage degenerates to single-task latency; with detected-hot-key salting
its rows spread over 16 salt buckets.

Usage: HOT_TURNS=1000000 SKEW_REPLICATE=16 SKEW_CORES=16 python bench_skew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SKEW_CORES", "16"))
    rep = int(os.environ.get("SKEW_REPLICATE", "16"))
    hot_turns = int(os.environ.get("HOT_TURNS", "1000000"))

    from pyspark.sql import functions as F

    from mehari_spark.dictionary import demo_patterns
    from mehari_spark.operators.mentions import detect_mentions, resolve_overlaps
    from mehari_spark.plans.pipeline import partition_for_scan
    from mehari_spark.session import get_spark
    from mehari_spark.sources.transcripts import transcripts

    spark = get_spark("mehari-spark-bench-skew", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    cold = transcripts(spark, sf_dir, spread=cores * 2)
    if rep > 1:
        reps = spark.range(rep).select(F.col("id").alias("_rep"))
        cold = (
            cold.crossJoin(reps)
            .withColumn(
                "conv_id", F.concat_ws("_", "conv_id", F.col("_rep").cast("string"))
            )
            .drop("_rep")
        )
    hot = spark.range(hot_turns).repartition(cores * 2).select(
        F.lit("conv_hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("spark join table merge window scan batch").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    data = cold.unionByName(hot).localCheckpoint(eager=True)
    n = data.count()

    results = {}
    for label, salt in (("unsalted", False), ("salted", True)):
        ordered = partition_for_scan(
            data, n_partitions=cores * 2, salt_hot=salt, hot_threshold=100_000
        )
        sizes = (
            ordered.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
            .first()
        )
        mentions = resolve_overlaps(detect_mentions(ordered, demo_patterns()))
        mentions.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        mentions.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        results[label] = {
            "elapsed_s": round(dt, 2),
            "max_partition_rows": int(sizes["mx"]),
            "mean_partition_rows": int(sizes["avg"]),
            "turns_per_sec": round(n / dt, 1),
        }
        print(f"# {label}: {dt:.2f}s, max partition {sizes['mx']:,} rows", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "skew_salting_speedup",
                "value": round(
                    results["unsalted"]["elapsed_s"] / results["salted"]["elapsed_s"], 2
                ),
                "unit": "x",
                "turns": n,
                "hot_turns": hot_turns,
                "cores": cores,
                "runs": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
