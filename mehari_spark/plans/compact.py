"""Bucket compaction: the small-file maintenance job (Iceberg
``rewrite_data_files`` analog) for tables written by plans/lineage.py.

Long-running ingest produces many small parquet files per bucket (every
staging task that held rows of the bucket wrote one); at 100 TB the
per-file open/footer overhead throttles every downstream scan. Compaction
rewrites each oversized bucket into ``target_files`` internally-sorted
files with the SAME crash-atomic rename-aside swap as the MERGE path
(plans/merge.py): stage -> verify row count + content fingerprint ->
rename live aside -> move staged in -> drop the aside — a crash at any
point is repaired forward/back by ``repair_interrupted_merge`` and the
checkpoint log only records buckets whose swap completed.

Content safety is checked, not assumed: the staged rewrite must match the
live bucket on BOTH row count and an order-independent content fingerprint
(bit_xor of xxhash64 over all columns) before the swap happens.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import append_checkpoint, write_metrics
from .merge import repair_interrupted_merge


def _bucket_files(bucket_dir: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(bucket_dir, "*.parquet"))
        if os.path.isfile(f)
    ]


def _fingerprint(df: DataFrame) -> tuple[int, int]:
    """(row_count, order-independent content hash) in one aggregation."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("fp"),
    ).first()
    return int(row["n"]), int(row["fp"] if row["fp"] is not None else 0)


def compact_buckets(
    spark: SparkSession,
    out_dir: str,
    run_id: str = "compact",
    target_files: int = 1,
    min_files: int = 2,
    sort_cols: list[str] | None = None,
    fail_mid_swap_bucket: int | None = None,
) -> dict:
    """Compact every committed bucket with more than ``min_files`` files.

    Returns {"compacted": {bucket: {files_before, files_after, rows}},
    "skipped": [buckets]}. ``sort_cols`` re-sorts rows within each output
    file (restoring the sorted-file invariant merged away by many small
    appends). ``fail_mid_swap_bucket`` injects a crash between the two
    swap renames (crash-recovery tests)."""
    repair_interrupted_merge(out_dir)
    for stale in glob.glob(os.path.join(out_dir, "_compactstage_*")):
        shutil.rmtree(stale, ignore_errors=True)

    compacted: dict[int, dict] = {}
    skipped: list[int] = []
    staging_root = os.path.join(out_dir, f"_compactstage_{run_id}")
    for bdir in sorted(glob.glob(os.path.join(out_dir, "bucket=*"))):
        name = os.path.basename(bdir)
        if name.endswith(".old"):
            continue
        b = int(name[len("bucket=") :])
        files = _bucket_files(bdir)
        if len(files) < min_files:
            skipped.append(b)
            continue
        t0 = time.time()
        live = spark.read.parquet(bdir)
        n_live, fp_live = _fingerprint(live)
        staged_dir = os.path.join(staging_root, f"bucket={b}")
        out = live.coalesce(target_files)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(staged_dir)
        n_staged, fp_staged = _fingerprint(spark.read.parquet(staged_dir))
        if (n_staged, fp_staged) != (n_live, fp_live):
            shutil.rmtree(staged_dir, ignore_errors=True)
            raise RuntimeError(
                f"compaction of bucket {b} would change content "
                f"(rows {n_live}->{n_staged}, fingerprint mismatch) — aborted"
            )
        # crash-atomic swap (merge.py protocol: aside, move in, drop aside)
        aside = bdir + ".old"
        os.replace(bdir, aside)
        if fail_mid_swap_bucket == b:
            raise RuntimeError(f"injected crash mid-swap of bucket {b}")
        os.replace(staged_dir, bdir)
        shutil.rmtree(aside, ignore_errors=True)
        files_after = len(_bucket_files(bdir))
        append_checkpoint(
            out_dir,
            {
                "run_id": run_id,
                "bucket": b,
                "status": "compacted",
                "rows_out": n_staged,
                "files_before": len(files),
                "files_after": files_after,
                "stage": "compact",
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "elapsed_s": round(time.time() - t0, 3),
            },
        )
        compacted[b] = {
            "files_before": len(files),
            "files_after": files_after,
            "rows": n_staged,
        }
    shutil.rmtree(staging_root, ignore_errors=True)
    write_metrics(
        out_dir,
        run_id,
        "compact",
        {"n_compacted": len(compacted), "n_skipped": len(skipped)},
    )
    return {"compacted": compacted, "skipped": skipped}
