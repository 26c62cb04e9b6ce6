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

- ``index/epoch=N/fp_bucket=B/``  fingerprint postings (doc_id, pos, fp)
  of every document seen, hive-partitioned by arrival epoch AND by
  ``fp_bucket = pmod(fp, n_fp_buckets)`` (the inverted index; seen-KEYS,
  never text);
- ``texts/epoch=N/doc_bucket=B/``  the corpus itself (doc_id, text),
  hive-partitioned by ``doc_bucket = pmod(doc_id, n_doc_buckets)`` —
  candidate verification needs real characters, and the corpus store is
  a TABLE, not stream state (the seen-keys-never-payloads rule
  constrains the state store, not the sink);
- ``spans/epoch=N/``  confirmed spans discovered at epoch N.

Per epoch: new postings equi-join the accumulated index (cross-epoch
candidates) and self-join within the batch (same-epoch candidates); the
seeds verify + extend against the texts (the batch path's row-wise Arrow
kernel, reused); results and the new postings/texts land in per-epoch
directories whose overwrite makes replay idempotent, and an
``epoch_done`` audit row marks completion (read once per query lifetime
— the kg_stream always-on discipline).

PER-EPOCH COST IS O(batch + matched buckets), NOT O(corpus) — the
round-7 full-scan weakness is closed by three mechanisms:

1. The index read is PRUNED to the batch's fingerprint buckets: the
   batch postings' distinct ``fp_bucket`` values (at most
   ``n_fp_buckets`` ints — bounded driver metadata, the plans/merge.py
   bucket-list discipline) become a literal partition filter, so Spark's
   static partition pruning never lists or opens index files of other
   buckets. With the default 1024 buckets a small batch prunes most of
   the accumulated index. (A literal IN filter prunes at PLAN time —
   strictly earlier than the broadcast-semi-join/DPP variant, which
   prunes at runtime.)
2. The texts read is PRUNED to the candidate documents' ``doc_bucket``
   partitions (collected from the materialized candidate seeds, again
   bounded metadata) — verification touches only buckets that hold a
   candidate doc, never the whole corpus store.
3. ``compact_span_store`` periodically merges fully-applied epoch dirs
   into ONE consolidated bucketed dir per store (the plans/compact.py
   discipline: stage -> fingerprint-verify -> atomic swap -> log), so
   partition discovery and per-bucket file counts stay bounded as
   epochs accumulate; the stream runs it inline every
   ``compact_every_epochs`` applied epochs.

EXACTNESS: every document pair meets exactly once — at the later doc's
arrival epoch (earlier doc's postings are already in the index), or in
the within-batch join when they share an epoch — so the union of per-
epoch spans over any arrival split EQUALS the batch operator over the
final corpus (winnowing guarantee >= k + w - 1 included); test-gated
across multi-wave arrivals and restart. Assumes doc_ids are unique
across the stream (re-ingesting an id would double its postings).
CAVEAT (round-7 ADVICE): ``max_df`` caps document frequency WITHIN each
arrival batch only, never against the accumulated index, so with a
finite ``max_df`` the stream's output can differ from the batch
operator run with the same ``max_df`` (a fingerprint seen once per
epoch is never capped); the union-equals-batch guarantee above holds
exactly for ``max_df=None``. Reference: seen-keys dedup across parallel
windows (/root/reference/mehari/src/db/mod.rs:208-309).
"""

from __future__ import annotations

import json
import os
import shutil

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
    # one basePath read of the whole subtree: epoch= (and the bucket
    # columns) are hive-style partition dirs, so per-leaf-dir reads would
    # fight partition discovery over multiple roots
    cols = [c.strip().split(" ")[0] for c in schema.split(",")]
    return spark.read.option("basePath", base).parquet(base).select(*cols)


def _pruned_index(
    spark: SparkSession, store_dir: str, buckets: list[int]
) -> DataFrame:
    """The accumulated index restricted to ``buckets`` — a LITERAL
    partition filter, so only matching ``fp_bucket=`` dirs are listed and
    their files opened (static partition pruning; test-gated via the
    scan's files-read metric)."""
    idx = _read_epochs(spark, store_dir, "index", _POSTING_SCHEMA)
    if not buckets:
        return idx.where(F.lit(False))
    return idx.where(F.col("fp_bucket").isin([int(b) for b in buckets]))


def _pruned_texts(
    spark: SparkSession, store_dir: str, doc_buckets: list[int]
) -> DataFrame:
    """The corpus store restricted to the candidate docs' ``doc_bucket``
    partitions (same literal-filter pruning as the index read)."""
    base = os.path.join(store_dir, "texts")
    if not _epoch_dirs(store_dir, "texts") or not doc_buckets:
        return spark.createDataFrame([], _TEXT_SCHEMA)
    return (
        spark.read.option("basePath", base)
        .parquet(base)
        .where(F.col("doc_bucket").isin([int(b) for b in doc_buckets]))
        .select("doc_id", "text")
    )


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


def _compacted_dir_epochs(name: str) -> tuple[int, int] | None:
    """epoch=c<lo>-<hi> -> (lo, hi); None for plain epoch=<int> dirs."""
    val = name.split("=", 1)[1]
    if not val.startswith("c"):
        return None
    lo, _, hi = val[1:].partition("-")
    return int(lo), int(hi)


def repair_span_compaction(store_dir: str) -> None:
    """Finish an interrupted compaction swap: if a staged-but-not-done
    log record's destination dir exists, the covered source dirs are
    removed (their content is already inside the destination — a crash
    between the rename and the source cleanup leaves duplicates, which
    are correctness-safe through the span distinct() but must not
    persist). A record whose destination never appeared needs nothing:
    the staging dir is underscore-prefixed and invisible to reads."""
    path = _ckpt_path(store_dir)
    if not os.path.exists(path):
        return
    staged: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("stage") != "span_compact":
                continue
            key = rec.get("dest", "")
            if rec.get("status") == "staged":
                staged[key] = rec
            elif rec.get("status") == "compact_done":
                staged.pop(key, None)
    for dest, rec in staged.items():
        if os.path.isdir(dest):
            for cov in rec.get("covers", []):
                shutil.rmtree(cov, ignore_errors=True)
            append_checkpoint(
                store_dir,
                {
                    "stage": "span_compact",
                    "status": "compact_done",
                    "dest": dest,
                    "repaired": True,
                },
            )
    for sub in ("index", "texts"):
        stale = os.path.join(store_dir, sub, "_compactstage")
        shutil.rmtree(stale, ignore_errors=True)


def compact_span_store(
    spark: SparkSession,
    store_dir: str,
    scope: str,
    min_epoch_dirs: int = 2,
) -> dict:
    """Merge fully-applied per-epoch dirs of the index and texts stores
    into ONE consolidated bucketed epoch dir each.

    plans/compact.py discipline: stage the rewrite under an
    underscore-prefixed dir (invisible to partition discovery), verify
    row count + two order-insensitive content fingerprints, atomically
    rename into place as ``epoch=c<lo>-<hi>``, then drop the source
    dirs; a staged/compact_done log pair makes an interrupted swap
    repairable (``repair_span_compaction``). Only epochs recorded
    ``epoch_done`` for ``scope`` are merged — an in-flight epoch may
    still be rewritten by replay and keeps its own dir. Returns
    {"index": n_dirs_merged, "texts": n_dirs_merged}."""
    from ..plans.compact import _fingerprint

    repair_span_compaction(store_dir)
    done = applied_epochs(store_dir, scope)
    out = {}
    for sub, part_col in (("index", "fp_bucket"), ("texts", "doc_bucket")):
        dirs = _epoch_dirs(store_dir, sub)
        eligible: list[str] = []
        epochs_covered: list[int] = []
        for d in dirs:
            name = os.path.basename(d)
            rng = _compacted_dir_epochs(name)
            if rng is not None:  # already-compacted dirs are always safe
                eligible.append(d)
                epochs_covered.extend(rng)
                continue
            ep = int(name.split("=", 1)[1])
            if ep in done:
                eligible.append(d)
                epochs_covered.append(ep)
        if len(eligible) < max(2, min_epoch_dirs):
            out[sub] = 0
            continue
        base = os.path.join(store_dir, sub)
        schema = _POSTING_SCHEMA if sub == "index" else _TEXT_SCHEMA
        cols = [c.strip().split(" ")[0] for c in schema.split(",")]
        if sub == "texts":
            cols = cols + ["doc_bucket"]
        live = (
            spark.read.option("basePath", base)
            .parquet(*eligible)
            .select(*cols)
        )
        n_live, fp_live, fps_live = _fingerprint(live)
        staged = os.path.join(base, "_compactstage")
        shutil.rmtree(staged, ignore_errors=True)
        live.repartition(part_col).write.mode("overwrite").partitionBy(
            part_col
        ).parquet(staged)
        if _fingerprint(spark.read.parquet(staged).select(*cols)) != (
            n_live,
            fp_live,
            fps_live,
        ):
            shutil.rmtree(staged, ignore_errors=True)
            raise RuntimeError(
                f"span-store compaction of {sub} would change content — aborted"
            )
        lo, hi = min(epochs_covered), max(epochs_covered)
        dest = os.path.join(base, f"epoch=c{lo}-{hi}")
        append_checkpoint(
            store_dir,
            {
                "stage": "span_compact",
                "status": "staged",
                "dest": dest,
                "covers": eligible,
            },
        )
        # the destination may exist from an earlier compaction round that
        # covered a smaller range ending at the same hi — dest names are
        # range-keyed so that cannot collide; remove defensively anyway
        shutil.rmtree(dest, ignore_errors=True)
        os.replace(staged, dest)
        for d in eligible:
            shutil.rmtree(d, ignore_errors=True)
        append_checkpoint(
            store_dir,
            {"stage": "span_compact", "status": "compact_done", "dest": dest},
        )
        out[sub] = len(eligible)
    return out


def stream_span_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    k: int = 24,
    w: int = 8,
    n_fp_buckets: int = 1024,
    n_doc_buckets: int = 64,
    max_df: int | None = None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    compact_every_epochs: int | None = 32,
) -> StreamingQuery:
    """Start the ingest-side span-dedup stream; returns the StreamingQuery.

    ``input_dir`` is a file-source directory of document parquet chunks
    (streaming/replay.write_arrival_chunk shape). ``compact_every_epochs``
    runs ``compact_span_store`` inline whenever the index holds at least
    that many epoch dirs (None disables)."""
    min_len = k + w - 1
    docs = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )
    scope = os.path.abspath(checkpoint_dir)
    repair_span_compaction(store_dir)
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
        # the batch postings feed three joins (index, self x2) and the
        # bucket collection — one materialization, not four winnowing scans
        postings_new = postings_new.localCheckpoint(eager=True)

        # distinct fp_buckets of THIS batch: bounded driver metadata
        # (<= n_fp_buckets ints) that prunes the index read to matching
        # partition dirs — per-epoch index IO is O(matched buckets), not
        # O(corpus)
        batch_buckets = [
            r[0] for r in postings_new.select("fp_bucket").distinct().collect()
        ]
        index = _pruned_index(spark, store_dir, batch_buckets)
        # cross-epoch candidates: stored doc x new doc on the fingerprint,
        # pair normalized to doc_a < doc_b (the batch operator's contract;
        # arrival order is an implementation detail). fp equality implies
        # fp_bucket equality, so the bucket is in the join implicitly.
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
        # materialize the seeds once: they feed the doc-bucket collection
        # AND the verify join
        cand = cross.unionByName(within).localCheckpoint(eager=True)
        cand_buckets = [
            r[0]
            for r in cand.select(
                F.explode(
                    F.array(
                        F.pmod("doc_a", F.lit(n_doc_buckets)),
                        F.pmod("doc_b", F.lit(n_doc_buckets)),
                    )
                ).alias("b")
            )
            .distinct()
            .collect()
        ]
        # candidate verification reads ONLY the candidate docs' buckets of
        # the corpus store (plus this batch's texts, not yet stored)
        texts_all = _pruned_texts(spark, store_dir, cand_buckets).unionByName(
            batch_texts
        )
        cand_t = cand.join(
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
            cand_t.mapInPandas(
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
        (
            batch_texts.withColumn(
                "doc_bucket",
                F.pmod("doc_id", F.lit(n_doc_buckets)).cast("int"),
            )
            .repartition("doc_bucket")
            .write.mode("overwrite")
            .partitionBy("doc_bucket")
            .parquet(os.path.join(store_dir, "texts", ep))
        )
        (
            postings_new.repartition("fp_bucket")
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
        for df in (postings_new, cand):
            try:  # release the epoch's checkpoint blocks (house pattern)
                df.rdd.unpersist()
            except Exception:
                pass
        if (
            compact_every_epochs is not None
            and len(_epoch_dirs(store_dir, "index")) >= compact_every_epochs
        ):
            compact_span_store(
                spark, store_dir, scope, min_epoch_dirs=compact_every_epochs
            )

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
