"""Structured Streaming triple extraction.

The fused per-turn kernel is stateless, so it lifts directly onto a
streaming DataFrame: ``readStream`` over the transcripts location →
``extract_triples_fused`` (mapInPandas is supported on streams) →
``foreachBatch`` append with a checkpointLocation for exactly-once.

Cross-turn coreference is windowed-stateful and stays in the batch pipeline
(mehari's compound buffering is likewise a batch-side concern,
compound.rs:33-170); a production deployment runs coref as a periodic batch
compaction over the streamed triples table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..dictionary import DictPattern
from ..operators.triples import extract_triples_fused
from ..schemas import TRANSCRIPTS_SCHEMA


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    patterns: list[DictPattern],
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Start a streaming query: transcripts parquet dir -> triples parquet.

    Exactly-once: foreachBatch writes each micro-batch atomically with the
    stream's checkpointLocation tracking committed source files (the
    streaming analog of our per-bucket batch checkpoints).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    triples = extract_triples_fused(stream, patterns)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        triples.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
