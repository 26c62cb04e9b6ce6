"""Streaming NEAR-DUP (MinHash-LSH) dedup: keep-first similarity dedup at
ingest — the streaming twin of the batch ``minhash_lsh_pairs`` path.

Batch near-dup dedup (operators/dedup.py:minhash_lsh_pairs) re-scans the
whole corpus; a 100 TB ingest pipeline dedups continuously instead. This
operator extends the exact-dedup keep-first discipline
(streaming/dedup_stream.py, reference seen-keys analog db/mod.rs:208-309)
from equality to similarity:

- A stateless Arrow stage computes, per arriving document, the SAME MinHash
  band keys as the batch path (identical kernels/minhash.py parameters:
  num_perm, bands, seed) plus the hashed distinct-token set.
- ``applyInPandasWithState`` keyed by (band_idx, band_key): state is the
  set of documents ever seen in that band bucket (ids + hashed token
  arrays). Each arriving document is exact-Jaccard re-ranked against the
  bucket's seen set (the batch path's re-rank, incremental); every arrival
  is then ADDED to state — dropped documents stay in the seen set, which is
  what makes verdicts transitive-chain-correct (B dropped for A still
  catches C ~ B).
- The foreachBatch sink folds a document's per-band verdicts (all emitted
  in its arrival trigger) into one keep/drop row: dup_of = min matching
  earlier doc across bands, NULL = kept. Epoch-dir overwrite makes replays
  idempotent; state commits with the checkpoint, so keep-first holds across
  restarts (exactly-once verdict per document).

SEMANTICS (agreement-tested vs batch): with documents arriving in doc_id
order (the standard monotone ingest-id discipline), the dropped set is
EXACTLY ``{doc_b of minhash_lsh_pairs(corpus)}`` — a document is dropped
iff some earlier document shares a band bucket and has exact token-set
Jaccard >= threshold. tests/test_stream_neardup.py asserts equality and
keep-first across a kill/restart.

STATE SIZE at scale: O(docs x bands) hashed-token arrays in the
partitioned state store. The two production mitigations (documented, not
needed at test scale): store the 128-perm signature instead of the token
set and re-rank on estimated Jaccard (constant 1 KB/doc/band), and age
buckets out with a TTL when the dedup horizon is bounded.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..kernels.minhash import band_keys, hash_tokens, minhash_signature, perm_params

DOCS_DDL = "doc_id long, lang string, text string"
BAND_DDL = "doc_id long, band_idx int, band_key long, tok_hashes array<long>"
VERDICT_DDL = "doc_id long, band_idx int, band_key long, dup_of long"
STATE_DDL = "ids array<long>, toks array<array<long>>"
OUT_DDL = "doc_id long, dup_of long, is_new boolean"


def _band_rows(
    it: Iterable[pd.DataFrame], num_perm: int, bands: int, seed: int
) -> Iterator[pd.DataFrame]:
    """Per document: ``bands`` rows carrying the band bucket key and the
    hashed distinct-token set (int64 view of the uint64 hashes — Spark has
    no unsigned long; the bit pattern is what matters)."""
    a, b = perm_params(num_perm, seed=seed)
    for pdf in it:
        ids: list[int] = []
        bidx: list[int] = []
        bkey: list[int] = []
        toks: list[np.ndarray] = []
        for doc_id, txt in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
            tok_list = sorted(set((txt or "").split(" ")))
            th = np.sort(hash_tokens(tok_list))
            sig = minhash_signature(th, a, b)
            signed = th.view(np.int64)
            for bi, bk in enumerate(band_keys(sig, bands)):
                ids.append(doc_id)
                bidx.append(bi)
                bkey.append(bk)
                toks.append(signed)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "band_idx": pd.Series(bidx, dtype="int32"),
                "band_key": pd.Series(bkey, dtype="int64"),
                "tok_hashes": pd.Series(toks, dtype="object"),
            }
        )


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    ni = np.intersect1d(a, b, assume_unique=True).size
    denom = a.size + b.size - ni
    return (ni / denom) if denom else 1.0


def _make_bucket_update(threshold: float):
    def update(key, pdf_iter, state: GroupState):
        ids: list[int] = []
        toks: list[np.ndarray] = []
        if state.exists:
            s_ids, s_toks = state.get
            ids = list(s_ids)
            toks = [np.asarray(t, dtype=np.int64) for t in s_toks]
        out_ids: list[int] = []
        out_dup: list[object] = []
        band_idx, band_key = int(key[0]), int(key[1])
        rows = []
        for pdf in pdf_iter:
            rows.extend(
                zip(pdf["doc_id"].tolist(), pdf["tok_hashes"].tolist())
            )
        # greedy keep-first needs ingest order WITHIN the trigger too
        rows.sort(key=lambda r: r[0])
        for doc_id, th in rows:
            th = np.asarray(th, dtype=np.int64)
            dup_of = None
            for eid, et in zip(ids, toks):
                if eid >= doc_id:
                    continue
                # size prefilter (J <= min/max): skip impossible pairs
                lo, hi = min(th.size, et.size), max(th.size, et.size)
                if hi and lo < threshold * hi:
                    continue
                if _jaccard(th, et) >= threshold:
                    dup_of = eid if dup_of is None else min(dup_of, eid)
            out_ids.append(doc_id)
            out_dup.append(dup_of)
            # EVERY arrival joins the seen set — dropped docs included, so
            # later members of a transitive chain still match
            ids.append(doc_id)
            toks.append(th)
        state.update(([int(i) for i in ids], [t.tolist() for t in toks]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "band_idx": pd.Series([band_idx] * len(out_ids), dtype="int32"),
                "band_key": pd.Series([band_key] * len(out_ids), dtype="int64"),
                "dup_of": pd.Series(out_dup, dtype="object"),
            }
        )

    return update


def stream_neardup_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.95,
    num_perm: int = 128,
    bands: int = 8,
    seed: int = 42,
    max_files_per_trigger: int = 64,
) -> StreamingQuery:
    """documents parquet dir (streamed) -> per-document keep/drop verdicts.

    Output rows (one per document, in its arrival epoch): ``is_new = true``
    marks kept documents; dropped rows carry ``dup_of`` = the earliest
    similar document. Filter ``is_new`` for the deduped corpus."""
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
        .select("doc_id", "text")
    )
    band_stream = stream.mapInPandas(
        lambda it: _band_rows(it, num_perm, bands, seed), schema=BAND_DDL
    )
    verdicts = band_stream.groupBy("band_idx", "band_key").applyInPandasWithState(
        _make_bucket_update(threshold),
        outputStructType=VERDICT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        # all `bands` verdicts for a document arrive in its own trigger:
        # fold them here (min matching earlier doc across bands); the
        # stateful operator never re-emits old documents, so each document
        # lands in exactly one epoch dir and replays overwrite idempotently
        folded = (
            batch_df.groupBy("doc_id")
            .agg(F.min("dup_of").alias("dup_of"))
            .select(
                "doc_id", "dup_of", F.col("dup_of").isNull().alias("is_new")
            )
        )
        folded.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"epoch={epoch_id}")
        )

    return (
        verdicts.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_verdicts(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.schema(OUT_DDL).parquet(os.path.join(output_dir, "epoch=*"))
