"""Custom stateful streaming operator via applyInPandasWithState.

Mehari's compound-variant buffer accumulates per-transcript state across an
ordered record stream and flushes aggregates (compound.rs:96-170). The
streaming analog: per-key state that SURVIVES micro-batch boundaries —
``applyInPandasWithState`` hands each key's Arrow batches plus a persistent
GroupState, so running totals keep counting across triggers without
reprocessing history (state is O(keys), checkpointed with the query).

This is the escape hatch beyond built-in windowed aggs (which cover the
session case, streaming/sessions.py): use it when per-key logic is
imperative — running thresholds, cross-batch dedup, custom flush rules.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .sessions import EVENTS_DDL

OUTPUT_DDL = "user_id long, n_total long, value_total_c long, n_batches int"
STATE_DDL = "n long, value_c long, batches int"


def _update_totals(key, pdf_iter, state: GroupState):
    """Fold this trigger's rows for one user into the persistent state and
    emit the updated running totals (one row per user per trigger)."""
    n, value_c, batches = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        value_c += int(round(float(pdf["value"].sum()) * 100))
    batches += 1
    state.update((n, value_c, batches))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_total": [n],
            "value_total_c": [value_c],
            "n_batches": [batches],
        }
    )


def stream_running_totals(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """events parquet dir (streamed) -> per-user running totals, one row per
    (user, trigger), cumulative ACROSS triggers via persistent group state."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_dir)
    )
    totals = stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"epoch={epoch_id}")
        )

    return (
        totals.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
