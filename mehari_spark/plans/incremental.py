"""Incremental view maintenance over the bucketed KG table: per-bucket
degree partials refreshed only for merge-touched buckets.

A continuously-maintained KG (streaming/kg_stream.py) needs its consumer
aggregates maintained too — recomputing a global degree profile after
every epoch re-scans the whole table, which at 100 TB is exactly the
re-scan the partition-pruned MERGE avoids. The standard fix is
partition-wise partial aggregation (materialized-view maintenance over
partitioned fact tables): keep one PARTIAL aggregate per bucket
(entity_id, n_out, n_in over that bucket's rows only), recompute only
the partials of buckets the epoch's merge rewrote, and serve the global
view as a cheap sum over partials. Per-epoch cost is O(touched
buckets); the global view never re-reads the fact table. This is the
same split the reference applies at its storage layer — per-key batched
upserts with derived tables rebuilt from changed ranges only
(db/mod.rs:208-309 discipline).

Partials are DERIVED data: every refresh is a deterministic function of
the bucket's current content, so refreshes are idempotent and crash
recovery needs no log — kg_stream orders merge -> refresh -> epoch_done,
so a crash anywhere in between replays the (idempotent) pair. A refresh
also catches up buckets that have data but no partial yet (maintenance
turned on mid-life), so the invariant after any refresh is: every data
bucket has a partial consistent with its content.

Layout: ``<table_dir>/_analytics/degree/part=<bucket>/*.parquet``,
written via staging + rename-aside swap (the lineage.py commit shape) so
readers never observe a half-written partial directory.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEGREE_SUBDIR = os.path.join("_analytics", "degree")


def _degree_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _DEGREE_SUBDIR)


def _existing_data_buckets(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_dir)
        if d.startswith("bucket=") and d.split("=", 1)[1].isdigit()
    )


def _partial_buckets(table_dir: str) -> list[int]:
    adir = _degree_dir(table_dir)
    if not os.path.isdir(adir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(adir)
        if d.startswith("part=") and d.split("=", 1)[1].isdigit()
    )


def refresh_degree_partials(
    spark: SparkSession, table_dir: str, touched_buckets: list[int]
) -> list[int]:
    """Recompute the degree partial of each touched bucket (plus any data
    bucket missing a partial — catch-up) from that bucket's CURRENT rows.

    One Spark job covers all refreshed buckets: the bucket dirs are read
    with a basePath so the ``bucket`` partition column survives, the
    incidence explode + (bucket, entity_id) agg computes every partial in
    parallel, and the staged output is swapped in per bucket
    (rename-aside — readers see old or new, never half). Returns the list
    of buckets actually refreshed. Idempotent: partials are a pure
    function of bucket content."""
    have = set(_partial_buckets(table_dir))
    data = _existing_data_buckets(table_dir)
    todo = sorted(set(touched_buckets) | {b for b in data if b not in have})
    todo = [b for b in todo if b in set(data)]
    if not todo:
        return []

    paths = [os.path.join(table_dir, f"bucket={b}") for b in todo]
    rows = spark.read.option("basePath", table_dir).parquet(*paths)
    inc = rows.select(
        F.col("bucket").alias("_part"),
        F.explode(
            F.array(
                F.struct(
                    F.col("subj_id").alias("entity_id"), F.lit(1).alias("is_out")
                ),
                F.struct(
                    F.col("obj_id").alias("entity_id"), F.lit(0).alias("is_out")
                ),
            )
        ).alias("e"),
    ).select("_part", "e.entity_id", "e.is_out")
    partials = inc.groupBy("_part", "entity_id").agg(
        F.sum("is_out").cast("long").alias("n_out"),
        F.sum(1 - F.col("is_out")).cast("long").alias("n_in"),
    )

    adir = _degree_dir(table_dir)
    os.makedirs(adir, exist_ok=True)
    staging = os.path.join(adir, f"_staging_{uuid.uuid4().hex[:8]}")
    try:
        partials.write.mode("overwrite").partitionBy("_part").parquet(staging)
        for b in todo:
            src = os.path.join(staging, f"_part={b}")
            dst = os.path.join(adir, f"part={b}")
            trash = os.path.join(adir, f"_old_part_{b}")
            if not os.path.isdir(src):
                # a bucket whose rows produced no partial rows cannot occur
                # (every row emits two incidence rows), but guard: write an
                # empty marker is unnecessary — skip
                continue
            shutil.rmtree(trash, ignore_errors=True)
            if os.path.isdir(dst):
                os.rename(dst, trash)
            os.rename(src, dst)
            shutil.rmtree(trash, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return todo


def read_kg_degree(spark: SparkSession, table_dir: str) -> DataFrame:
    """(entity_id, n_out, n_in): the maintained global degree view — a sum
    over per-bucket partials, never a fact-table scan.

    Raises if maintenance never ran (no partials) while the table has
    data, rather than silently serving an empty or stale view."""
    data = _existing_data_buckets(table_dir)
    have = _partial_buckets(table_dir)
    if data and not have:
        raise FileNotFoundError(
            f"no degree partials under {table_dir!r} — run the maintenance "
            "stream with maintain_degree=True (or refresh_degree_partials)"
        )
    missing = sorted(set(data) - set(have))
    if missing:
        raise RuntimeError(
            f"degree partials missing for data buckets {missing} of "
            f"{table_dir!r} — refresh before reading"
        )
    partials = spark.read.parquet(os.path.join(_degree_dir(table_dir), "part=*"))
    return partials.groupBy("entity_id").agg(
        F.sum("n_out").cast("long").alias("n_out"),
        F.sum("n_in").cast("long").alias("n_in"),
    )
