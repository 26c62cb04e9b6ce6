"""spark-submit entry point for CONTINUOUS KG maintenance.

Starts the maintenance stream (streaming/kg_stream.py): a file-source
directory of arriving transcript chunks -> fused triple extraction per
micro-batch -> latest-assertion-wins partition-pruned MERGE into the
bucketed triple table, with optional incremental degree-view maintenance
(plans/incremental.py). Exactly-once via the idempotent precedence merge
plus checkpoint-scoped epoch audit rows; restart with the same
--checkpoint resumes, never re-applies.

Cluster usage (north_rule packaging contract):

    zip -r mehari_spark.zip mehari_spark
    spark-submit --py-files mehari_spark.zip jobs/run_kg_stream_job.py \
        --input <arrival dir> --table <kg table dir> \
        --checkpoint <stream checkpoint dir> \
        [--buckets 64] [--max-files-per-trigger 16] [--maintain-degree] \
        [--maintain-predicates] [--available-now | --follow]

``--available-now`` (default) drains everything currently in --input and
exits — the batch-catchup / cron shape. ``--follow`` runs until killed,
processing chunks as they arrive — the always-on ingest shape.

Sandbox smoke (bare python needs the repo on PYTHONPATH; spark-submit
ships the zip instead):

    PYTHONPATH=. python jobs/run_kg_stream_job.py \
        --sf-dir /root/testdata/sf0.001 \
        --table /tmp/kg_tbl --checkpoint /tmp/kg_ck --maintain-degree
    (seeds --input from the sf transcripts, drains, prints table stats)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description="mehari_spark streaming KG maintenance")
    ap.add_argument("--input", help="arrival directory of transcript parquet chunks")
    ap.add_argument("--sf-dir", help="testdata sf dir (seed --input for the smoke run)")
    ap.add_argument("--table", required=True, help="bucketed KG table directory")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    ap.add_argument("--maintain-degree", action="store_true")
    ap.add_argument(
        "--maintain-predicates",
        action="store_true",
        help="also maintain the per-predicate assertion-count view "
        "(plans/incremental.py PREDICATE_VIEW, same refresh machinery)",
    )
    ap.add_argument(
        "--follow",
        action="store_true",
        help="run until killed instead of draining once (availableNow)",
    )
    args = ap.parse_args()
    if not args.input and not args.sf_dir:
        ap.error("one of --input / --sf-dir is required")

    from pyspark.sql import SparkSession

    from mehari_spark.dictionary import demo_patterns
    from mehari_spark.streaming.kg_stream import (
        applied_epochs,
        read_kg_current,
        stream_kg_maintain,
    )

    spark = SparkSession.builder.appName("mehari-spark-kg-stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    input_dir = args.input
    if not input_dir:
        from mehari_spark.sources.transcripts import transcripts
        from mehari_spark.streaming.replay import write_arrival_chunk

        input_dir = os.path.join(os.path.dirname(args.table), "_kg_arrivals")
        write_arrival_chunk(transcripts(spark, args.sf_dir), input_dir)

    extra_views = []
    if args.maintain_predicates:
        from mehari_spark.plans.incremental import PREDICATE_VIEW

        extra_views.append(PREDICATE_VIEW)

    q = stream_kg_maintain(
        spark,
        input_dir,
        args.table,
        args.checkpoint,
        demo_patterns(),
        n_buckets=args.buckets,
        max_files_per_trigger=args.max_files_per_trigger,
        maintain_degree=args.maintain_degree,
        maintain_views=(extra_views or None),
        available_now=not args.follow,
    )
    q.awaitTermination()

    stats = {
        "epochs_applied": len(
            applied_epochs(args.table, os.path.abspath(args.checkpoint))
        ),
        "current_rows": read_kg_current(spark, args.table).count(),
    }
    if args.maintain_degree:
        from mehari_spark.plans.incremental import read_kg_degree

        stats["degree_entities"] = read_kg_degree(spark, args.table).count()
    if args.maintain_predicates:
        from mehari_spark.plans.incremental import PREDICATE_VIEW, read_view

        stats["predicates"] = read_view(spark, args.table, PREDICATE_VIEW).count()
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
