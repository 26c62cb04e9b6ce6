"""Output sinks beyond parquet (mehari S2-S5 analogs, SURVEY.md §2.1).

- JSONL (S3, SeqvarJsonlWriter analog): one JSON document per triple with a
  nested lineage struct.
- TSV (S4, VarFish TSV analog): flattened tab-separated export.

Both are thin, declarative wrappers — serialization is `to_json` /
csv-writer Catalyst work, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_triples_jsonl(triples: DataFrame, out_dir: str, run_id: str) -> None:
    doc = F.to_json(
        F.struct(
            "conv_id",
            "turn_idx",
            "subj_id",
            "pred_id",
            "obj_id",
            F.struct(F.lit(run_id).alias("run_id")).alias("lineage"),
        )
    )
    triples.select(doc.alias("value")).write.mode("overwrite").text(out_dir)


def write_triples_tsv(triples: DataFrame, out_dir: str) -> None:
    cols = ["conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"]
    triples.select(*cols).write.mode("overwrite").option("sep", "\t").option(
        "header", "true"
    ).csv(out_dir)


def read_triples_tsv(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("sep", "\t").option("header", "true").csv(
        out_dir,
        schema=(
            "conv_id string, turn_idx int, subj_id long, pred_id long, obj_id long"
        ),
    )


def merge_dictionaries(*dicts: DataFrame) -> DataFrame:
    """J10 analog (db/transcripts/merge.rs:26-116): union entity dictionaries,
    merging duplicate aliases by keeping the lowest entity_id and OR-ing
    filter reasons."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dicts)
    agg_cols = [F.min("entity_id").alias("entity_id")]
    if "filter_reason" in unioned.columns:
        agg_cols.append(
            F.bit_or(F.coalesce(F.col("filter_reason"), F.lit(0))).alias(
                "filter_reason"
            )
        )
    return unioned.groupBy("alias").agg(*agg_cols)
