"""Streaming span-level substring dedup: arriving documents -> winnowed
fingerprint postings -> candidates against the ACCUMULATED fingerprint
index -> verify + maximal extension against the text store -> confirmed
cross-document shared spans, continuously.

The batch operator (operators/spandedup.span_matches_winnowed) finds
shared passages across a static corpus; production ingest needs the same
answer INCREMENTALLY — each arriving document checked against everything
seen so far without re-scanning the corpus. Same state discipline as the
continuous KG maintenance (streaming/kg_stream.py): the streaming query
itself is STATELESS — state lives in three on-disk tables under
``store_dir`` plus the commit log —

- ``index/epoch=N/``  fingerprint postings (doc_id, pos, fp, fp_bucket)
  of every document seen, partitioned by arrival epoch and bucketed by
  fingerprint for pruning (the inverted index; seen-KEYS, never text);
- ``texts/epoch=N/``  the corpus itself (doc_id, text) — candidate
  verification needs real characters, and the corpus store is a TABLE,
  not stream state (the seen-keys-never-payloads rule constrains the
  state store, not the sink);
- ``spans/epoch=N/``  confirmed spans discovered at epoch N.

Per epoch: new postings equi-join the accumulated index (cross-epoch
candidates) and self-join within the batch (same-epoch candidates); the
seeds verify + extend against the texts (the batch path's row-wise Arrow
kernel, reused); results and the new postings/texts land in per-epoch
directories whose overwrite makes replay idempotent, and an
``epoch_done`` audit row marks completion (read once per query lifetime
— the kg_stream always-on discipline).

EXACTNESS: every document pair meets exactly once — at the later doc's
arrival epoch (earlier doc's postings are already in the index), or in
the within-batch join when they share an epoch — so the union of per-
epoch spans over any arrival split EQUALS the batch operator over the
final corpus (winnowing guarantee >= k + w - 1 included); test-gated
across multi-wave arrivals and restart. Assumes doc_ids are unique
across the stream (re-ingesting an id would double its postings).

Scale notes (100 TB): per-epoch cost is O(batch postings x matching
index buckets) — the index join is an equi-join on the fingerprint,
prunable by fp_bucket, never a corpus scan; the text join touches only
candidate doc_ids. ``max_df`` caps boilerplate-fingerprint fan-out
(spandedup discipline). Reference: seen-keys dedup across parallel
windows (/root/reference/mehari/src/db/mod.rs:208-309).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.spandedup import _verify_extend_rows, winnowed_postings
from ..plans.lineage import _ckpt_path, append_checkpoint

DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"
_POSTING_SCHEMA = "doc_id long, pos int, fp long, fp_bucket int"
_SPAN_SCHEMA = "doc_a long, doc_b long, start_a long, start_b long, span_len long"
_TEXT_SCHEMA = "doc_id long, text string"


def _epoch_dirs(store_dir: str, sub: str) -> list[str]:
    base = os.path.join(store_dir, sub)
    if not os.path.isdir(base):
        return []
    return sorted(
        os.path.join(base, d)
        for d in os.listdir(base)
        if d.startswith("epoch=")
    )


def _read_epochs(
    spark: SparkSession, store_dir: str, sub: str, schema: str
) -> DataFrame:
    base = os.path.join(store_dir, sub)
    if not _epoch_dirs(store_dir, sub):
        return spark.createDataFrame([], schema)
    # one basePath read of the whole subtree: epoch= (and fp_bucket= for
    # the index) are hive-style partition dirs, so per-leaf-dir reads
    # would fight partition discovery over multiple roots
    cols = [c.strip().split(" ")[0] for c in schema.split(",")]
    return spark.read.option("basePath", base).parquet(base).select(*cols)


def applied_epochs(store_dir: str, scope: str) -> set[int]:
    """Completed epoch ids for this checkpoint lineage (read ONCE per
    query lifetime; the closure appends in memory)."""
    path = _ckpt_path(store_dir)
    done: set[int] = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if (
                    rec.get("stage") == "span_stream"
                    and rec.get("scope") == scope
                    and rec.get("status") == "epoch_done"
                ):
                    done.add(int(rec["epoch"]))
    return done


def stream_span_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    k: int = 24,
    w: int = 8,
    n_fp_buckets: int = 16,
    max_df: int | None = None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the ingest-side span-dedup stream; returns the StreamingQuery.

    ``input_dir`` is a file-source directory of document parquet chunks
    (streaming/replay.write_arrival_chunk shape)."""
    min_len = k + w - 1
    docs = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    scope = os.path.abspath(checkpoint_dir)
    applied = applied_epochs(store_dir, scope)

    def apply_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if int(epoch_id) in applied:
            return  # replayed epoch: already fully applied
        batch_texts = batch_df.select("doc_id", "text")
        postings_new = winnowed_postings(batch_texts, k, w).withColumn(
            "fp_bucket", F.pmod("fp", F.lit(n_fp_buckets)).cast("int")
        )
        if max_df is not None:
            hot = (
                postings_new.groupBy("fp")
                .agg(F.count_distinct("doc_id").alias("_nd"))
                .where(F.col("_nd") > max_df)
                .select("fp")
            )
            postings_new = postings_new.join(F.broadcast(hot), "fp", "left_anti")
        # the batch postings feed three joins (index, self x2) — one
        # materialization, not three winnowing scans
        postings_new = postings_new.localCheckpoint(eager=True)

        index = _read_epochs(spark, store_dir, "index", _POSTING_SCHEMA)
        # cross-epoch candidates: stored doc x new doc on the fingerprint,
        # pair normalized to doc_a < doc_b (the batch operator's contract;
        # arrival order is an implementation detail)
        o, n = index.alias("o"), postings_new.alias("n")
        cross = o.join(
            n,
            (F.col("o.fp") == F.col("n.fp"))
            & (F.col("o.doc_id") != F.col("n.doc_id")),
        ).select(
            F.least("o.doc_id", "n.doc_id").alias("doc_a"),
            F.greatest("o.doc_id", "n.doc_id").alias("doc_b"),
            F.when(F.col("o.doc_id") < F.col("n.doc_id"), F.col("o.pos"))
            .otherwise(F.col("n.pos"))
            .alias("pos_a"),
            F.when(F.col("o.doc_id") < F.col("n.doc_id"), F.col("n.pos"))
            .otherwise(F.col("o.pos"))
            .alias("pos_b"),
        )
        a, b = postings_new.alias("a"), postings_new.alias("b")
        within = a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
        cand = cross.unionByName(within)

        texts_all = _read_epochs(spark, store_dir, "texts", _TEXT_SCHEMA).unionByName(
            batch_texts
        )
        cand = cand.join(
            texts_all.select(
                F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
            ),
            "doc_a",
        ).join(
            texts_all.select(
                F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
            ),
            "doc_b",
        )
        spans = (
            cand.mapInPandas(
                lambda it: _verify_extend_rows(it, k, min_len),
                schema=_SPAN_SCHEMA,
            )
            .distinct()
        )
        # per-epoch dirs: mode=overwrite makes a replayed epoch rewrite the
        # same content — idempotent without a merge
        ep = f"epoch={int(epoch_id)}"
        spans.write.mode("overwrite").parquet(
            os.path.join(store_dir, "spans", ep)
        )
        batch_texts.write.mode("overwrite").parquet(
            os.path.join(store_dir, "texts", ep)
        )
        (
            postings_new.repartition(n_fp_buckets, "fp_bucket")
            .write.mode("overwrite")
            .partitionBy("fp_bucket")
            .parquet(os.path.join(store_dir, "index", ep))
        )
        append_checkpoint(
            store_dir,
            {
                "status": "epoch_done",
                "stage": "span_stream",
                "scope": scope,
                "epoch": int(epoch_id),
            },
        )
        applied.add(int(epoch_id))
        try:  # release the epoch's checkpoint blocks (house pattern)
            postings_new.rdd.unpersist()
        except Exception:
            pass

    writer = docs.writeStream.foreachBatch(apply_epoch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_span_matches(spark: SparkSession, store_dir: str) -> DataFrame:
    """All confirmed spans discovered so far — comparable 1:1 with
    operators/spandedup.span_matches_winnowed over the full corpus (each
    pair meets exactly once, so the plain union is duplicate-free)."""
    return _read_epochs(spark, store_dir, "spans", _SPAN_SCHEMA)


def read_corpus_texts(spark: SparkSession, store_dir: str) -> DataFrame:
    return _read_epochs(spark, store_dir, "texts", _TEXT_SCHEMA)
