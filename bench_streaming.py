"""Streaming-operator throughput bench: replay finite inputs through the
three stateful streaming pipelines and report rows/sec each.

- exact dedup   (streaming/dedup_stream.py)   — documents, replicated
- near-dup dedup (streaming/neardup_stream.py) — documents (LSH state)
- sessionization (streaming/sessions.py)       — events

Replay protocol: the input is fully written up front; maxFilesPerTrigger
paces micro-batches, so the measurement covers steady-state trigger
processing (state lookups + sink commits), not file arrival. One JSON
line on stdout.

Usage: python bench_streaming.py
Env:   SPARK_GRAFT_CPUS (32), STREAM_DOC_REPLICATE (8 -> 40k docs),
       MEHARI_SPARK_LOCAL_DIR
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    from pyspark.sql import functions as F

    from mehari_spark.session import get_spark
    from mehari_spark.operators.textstats import STOPWORDS
    from mehari_spark.streaming.dedup_stream import stream_dedup
    from mehari_spark.streaming.neardup_stream import stream_neardup_dedup
    from mehari_spark.streaming.sessions import finalize_stream, stream_sessions

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(os.environ.get("STREAM_DOC_REPLICATE", "8"))
    spark = get_spark("mehari-spark-stream-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stream-bench-")
    out: dict = {"metric": "streaming_rows_per_sec", "cores": cores}

    # --- replicated doc corpus (same replica-tagging as the scaling bench:
    # within-replica near-dup structure kept, no cross-replica cliques)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split("text", " "),
            lambda t: F.when(F.array_contains(stop_arr, t), t).otherwise(
                F.concat(t, F.lit("@"), F.col("_r"))
            ),
        ),
    )
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r") * 1_000_000).alias("doc_id"),
            "lang",
            tagged.alias("text"),
        )
    )
    doc_dir = os.path.join(tmp, "docs_in")
    big.repartition(32).write.mode("overwrite").parquet(doc_dir)
    n_docs = spark.read.parquet(doc_dir).count()

    def run_stream(name, starter, in_count):
        t0 = time.time()
        q = starter()
        q.processAllAvailable()
        q.stop()
        dt = time.time() - t0
        out[name] = {
            "rows": in_count,
            "sec": round(dt, 2),
            "rows_per_sec": round(in_count / dt, 1),
        }

    run_stream(
        "exact_dedup",
        lambda: stream_dedup(
            spark, doc_dir, os.path.join(tmp, "d_out"), os.path.join(tmp, "d_ck")
        ),
        n_docs,
    )
    run_stream(
        "neardup_dedup",
        lambda: stream_neardup_dedup(
            spark,
            doc_dir,
            os.path.join(tmp, "n_out"),
            os.path.join(tmp, "n_ck"),
            threshold=0.95,
        ),
        n_docs,
    )

    ev_dir = os.path.join(tmp, "events_in")
    (
        spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(ev_dir)
    )
    n_events = spark.read.parquet(ev_dir).count()
    t0 = time.time()
    q = stream_sessions(
        spark, ev_dir, os.path.join(tmp, "s_out"), os.path.join(tmp, "s_ck")
    )
    q.processAllAvailable()
    finalize_stream(q, spark, ev_dir)
    dt = time.time() - t0
    out["sessions"] = {
        "rows": n_events,
        "sec": round(dt, 2),
        "rows_per_sec": round(n_events / dt, 1),
    }

    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
