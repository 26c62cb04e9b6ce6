"""Streaming exact dedup: keep-first document dedup over an ingest stream.

The 100 TB ingest-side form of the batch `doc_exact_dedup` operator:
documents arrive continuously; a document whose content hash was already
seen in ANY earlier micro-batch is a duplicate. Mehari's analog is the
global seen-keys dedup inside parallel ingest (db/mod.rs:208-309).

State design: the group KEY is the content hash itself, so per-key state is
a tiny (first_doc_id, n_seen) tuple and total state is O(distinct
documents) in the checkpointed state store (RocksDB-backed on a cluster,
partitioned by hash — horizontally scalable, no global set on any single
node). The operator emits one row per (hash, trigger-it-appeared-in):
``is_new`` marks the trigger that FIRST saw the hash, so downstream keeps
exactly the first copy and the emission is exactly-once per document
(state and sink offsets commit together with the query checkpoint).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_DDL = "doc_id long, lang string, text string"
DEDUP_OUT_DDL = "text_hash string, first_doc_id long, n_seen long, is_new boolean"
DEDUP_STATE_DDL = "first_doc_id long, n_seen long"


def _dedup_update(key, pdf_iter, state: GroupState):
    """Fold one content-hash group's rows for this trigger into state."""
    existed = state.exists
    first, n = state.get if existed else (None, 0)
    batch_min = None
    batch_n = 0
    for pdf in pdf_iter:
        batch_n += len(pdf)
        m = int(pdf["doc_id"].min())
        batch_min = m if batch_min is None else min(batch_min, m)
    if first is None:
        first = batch_min
    n += batch_n
    state.update((int(first), int(n)))
    yield pd.DataFrame(
        {
            "text_hash": [key[0]],
            "first_doc_id": [int(first)],
            "n_seen": [int(n)],
            "is_new": [not existed],
        }
    )


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 64,
) -> StreamingQuery:
    """documents parquet dir (streamed) -> per-hash dedup verdict rows.

    Downstream filter ``is_new`` yields the kept (first-copy) corpus;
    ``is_new = false`` rows carry the running duplicate count for audit.
    """
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
        .withColumn("text_hash", F.md5("text"))
        .select("text_hash", "doc_id")
    )
    verdicts = stream.groupBy("text_hash").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUT_DDL,
        stateStructType=DEDUP_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"epoch={epoch_id}")
        )

    return (
        verdicts.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
