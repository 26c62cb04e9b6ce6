"""Streaming NEAR-DUP (MinHash-LSH) dedup: keep-first similarity dedup at
ingest — the streaming twin of the batch ``minhash_lsh_pairs`` path.

Batch near-dup dedup (operators/dedup.py:minhash_lsh_pairs) re-scans the
whole corpus; a 100 TB ingest pipeline dedups continuously instead. This
operator extends the exact-dedup keep-first discipline
(streaming/dedup_stream.py, reference seen-keys analog db/mod.rs:208-309)
from equality to similarity:

- A stateless Arrow stage computes, per arriving document, the SAME MinHash
  band keys as the batch path (identical kernels/minhash.py parameters:
  num_perm, bands, seed) plus a per-document payload (see state modes).
- ``applyInPandasWithState`` keyed by (band_idx, band_key): state is the
  set of documents ever seen in that band bucket. Each arriving document
  is re-ranked against the bucket's seen set; every arrival is then ADDED
  to state — dropped documents stay in the seen set, which is what makes
  verdicts transitive-chain-correct (B dropped for A still catches C ~ B).
- The foreachBatch sink folds a document's per-band verdicts (all emitted
  in its arrival trigger) into one keep/drop row: dup_of = min matching
  seen doc across bands, NULL = kept. Epoch-dir overwrite makes replays
  idempotent; state commits with the checkpoint, so keep-first holds across
  restarts (exactly-once verdict per document).

STATE MODES (the 100 TB knob):

- ``state_mode="tokens"`` — state stores each doc's hashed distinct-token
  array; re-rank is EXACT token-set Jaccard (the batch path's re-rank,
  incremental). Verdict-identical to batch, but state grows with corpus
  TEXT volume: O(docs x bands x tokens).
- ``state_mode="signature"`` — BOUNDED state: per doc/band at most
  num_perm longs + a 2-long header (~1 KB at 128 perms). Adaptive
  payload: a doc with <= num_perm distinct tokens stores its EXACT
  token-hash set (no larger than the signature would be — short sets
  are where estimation is least reliable AND where exact is free), a
  longer doc stores the num_perm MinHash signature. Exact-vs-exact
  re-ranks are exact Jaccard; any comparison involving a signature uses
  the BAND-EXCLUDED agreement estimator: the fraction of agreeing
  positions OUTSIDE this bucket's own band. Conditioning on a band
  collision forces that band's rows equal, which inflates the naive
  all-positions estimator by ~(1-J)/bands (measured +0.030 at J~0.8 on
  the demo corpus, the previously-documented "tiny-set bias" — it was
  SELECTION bias, not hash-family bias); excluding the colliding band
  restores an unbiased estimate (measured residual +0.007, the
  second-order multi-band-collision term) with std
  sqrt(J(1-J)/(num_perm - num_perm/bands)) ~ 0.02 at J=0.95. A
  stored-size header also lets every comparison run the same
  min/max-size prefilter as the batch path. This is the reference
  seen-KEYS discipline — constant-bounded state per key, never
  unbounded payloads (db/mod.rs:208-309) — and the mode that holds at
  100 TB. Verdicts agree with batch everywhere short docs are involved
  (exact) and wherever |J - threshold| clears a few estimator sigma for
  long ones; sig-vs-sig pairs within ~2 sigma of the threshold may
  still flip (tests pin exact agreement on the sf0.001 demo corpus —
  all-short, fully exact — and on a margin-clear long-doc corpus).

STATE TTL (``state_ttl_ms``): bounds the dedup horizon. Buckets idle
longer than the TTL are purged (ProcessingTimeTimeout — purge fires on
the first trigger after expiry), after which a new near-dup of a
forgotten document is KEPT. Unset = unbounded horizon (exact keep-first
forever, state O(distinct buckets)).

ARRIVAL-ORDER SEMANTICS: a document is dropped iff ANY already-seen
document in one of its band buckets matches (dup_of = the smallest such
id) — so the KEPT set is near-dup-free under any arrival order, and
verdicts are keep-FIRST-ARRIVAL. Batch ``minhash_lsh_pairs`` equality
(dropped set == {doc_b}) additionally requires the standard monotone
ingest discipline: feed chunks in doc_id order (sequentially written
files — FileStreamSource orders files by modification time with
arbitrary ties, so a pre-written directory of unordered files has no
order guarantee); within a trigger the operator itself processes rows in
doc_id order.
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
BAND_DDL = "doc_id long, band_idx int, band_key long, payload array<long>"
VERDICT_DDL = "doc_id long, band_idx int, band_key long, dup_of long"
STATE_DDL = "ids array<long>, payloads array<array<long>>"
OUT_DDL = "doc_id long, dup_of long, is_new boolean"


# payload layout (state + wire): [tag, n_distinct, *data]
#   tag 0 = exact  — data is the sorted hashed distinct-token set (int64
#           view of the uint64 hashes; the bit pattern is what matters)
#   tag 1 = signature — data is the num_perm MinHash signature (values
#           < 2^61, fit int64)
# In signature mode the payload is ADAPTIVE: tag 0 whenever the token
# set is no larger than the signature would be (bounded either way);
# tokens mode is always tag 0 (unbounded exact state).
_TAG_EXACT, _TAG_SIG = 0, 1


def _band_rows(
    it: Iterable[pd.DataFrame],
    num_perm: int,
    bands: int,
    seed: int,
    signature_state: bool,
) -> Iterator[pd.DataFrame]:
    """Per document: ``bands`` rows carrying the band bucket key and the
    tagged state payload (see layout above)."""
    a, b = perm_params(num_perm, seed=seed)
    for pdf in it:
        ids: list[int] = []
        bidx: list[int] = []
        bkey: list[int] = []
        payloads: list[np.ndarray] = []
        for doc_id, txt in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
            tok_list = sorted(set((txt or "").split(" ")))
            th = np.sort(hash_tokens(tok_list))
            sig = minhash_signature(th, a, b)
            if signature_state and th.size > num_perm:
                payload = np.concatenate(
                    ([_TAG_SIG, th.size], sig.astype(np.int64))
                )
            else:
                payload = np.concatenate(
                    ([_TAG_EXACT, th.size], th.view(np.int64))
                )
            for bi, bk in enumerate(band_keys(sig, bands)):
                ids.append(doc_id)
                bidx.append(bi)
                bkey.append(bk)
                payloads.append(payload)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "band_idx": pd.Series(bidx, dtype="int32"),
                "band_key": pd.Series(bkey, dtype="int64"),
                "payload": pd.Series(payloads, dtype="object"),
            }
        )


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    ni = np.intersect1d(a, b, assume_unique=True).size
    denom = a.size + b.size - ni
    return (ni / denom) if denom else 1.0


def _empty_verdicts(band_idx: int = 0, band_key: int = 0) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "band_idx": pd.Series([], dtype="int32"),
            "band_key": pd.Series([], dtype="int64"),
            "dup_of": pd.Series([], dtype="object"),
        }
    )


def _make_bucket_update(
    threshold: float,
    ttl_ms: int | None,
    num_perm: int,
    bands: int,
    seed: int,
):
    rpb = num_perm // bands

    def update(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            # bucket idle past the dedup horizon: forget it entirely
            state.remove()
            yield _empty_verdicts()
            return
        a, b = perm_params(num_perm, seed=seed)
        ids: list[int] = []
        payloads: list[np.ndarray] = []
        if state.exists:
            s_ids, s_payloads = state.get
            ids = list(s_ids)
            payloads = [np.asarray(t, dtype=np.int64) for t in s_payloads]
        out_ids: list[int] = []
        out_dup: list[object] = []
        band_idx, band_key = int(key[0]), int(key[1])
        # BAND-EXCLUDED estimator mask: membership in THIS bucket already
        # conditions on this band's rows agreeing, so those positions
        # carry no information about J — including them inflates the
        # estimate by ~(1-J)/bands (selection bias, measured; module
        # docstring). Estimate from the other bands' positions only.
        est_mask = np.ones(num_perm, dtype=bool)
        est_mask[band_idx * rpb : (band_idx + 1) * rpb] = False
        sig_cache: dict[int, np.ndarray] = {}

        def _sig_of(entry_id: int, tag: int, data: np.ndarray) -> np.ndarray:
            # signature for a mixed comparison: stored directly (tag 1)
            # or recomputed from the exact token hashes (tag 0 — cheap:
            # <= num_perm tokens by construction)
            got = sig_cache.get(entry_id)
            if got is None:
                got = (
                    data.view(np.uint64)
                    if tag == _TAG_SIG
                    else minhash_signature(data.view(np.uint64), a, b)
                )
                sig_cache[entry_id] = got
            return got

        rows = []
        for pdf in pdf_iter:
            rows.extend(zip(pdf["doc_id"].tolist(), pdf["payload"].tolist()))
        # keep-first needs ingest (id) order WITHIN the trigger too
        rows.sort(key=lambda r: r[0])
        for doc_id, pl in rows:
            pl = np.asarray(pl, dtype=np.int64)
            tag_d, n_d, data_d = int(pl[0]), int(pl[1]), pl[2:]
            dup_of = None
            # match against EVERY seen entry regardless of id order —
            # verdicts are keep-first-ARRIVAL, robust to out-of-order
            # delivery (== keep-lowest-id under monotone ingest)
            for eid, ep in zip(ids, payloads):
                if eid == doc_id:
                    continue
                tag_e, n_e, data_e = int(ep[0]), int(ep[1]), ep[2:]
                # size prefilter (J <= min/max) from the stored distinct
                # counts: skip impossible pairs before any compare
                lo, hi = min(n_d, n_e), max(n_d, n_e)
                if hi and lo < threshold * hi:
                    continue
                if tag_d == _TAG_EXACT and tag_e == _TAG_EXACT:
                    match = _jaccard(data_d, data_e) >= threshold
                else:
                    est = (
                        _sig_of(doc_id, tag_d, data_d)
                        == _sig_of(eid, tag_e, data_e)
                    )[est_mask].mean()
                    match = est >= threshold
                if match:
                    dup_of = eid if dup_of is None else min(dup_of, eid)
            out_ids.append(doc_id)
            out_dup.append(dup_of)
            # EVERY arrival joins the seen set — dropped docs included, so
            # later members of a transitive chain still match
            ids.append(doc_id)
            payloads.append(pl)
        state.update(
            ([int(i) for i in ids], [t.tolist() for t in payloads])
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
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
    state_mode: str = "tokens",
    state_ttl_ms: int | None = None,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """documents parquet dir (streamed) -> per-document keep/drop verdicts.

    Output rows (one per document, in its arrival epoch): ``is_new = true``
    marks kept documents; dropped rows carry ``dup_of`` = the earliest
    similar document. Filter ``is_new`` for the deduped corpus.

    ``state_mode``: "tokens" (exact re-rank, batch-identical verdicts,
    payload-sized state) or "signature" (BOUNDED <= num_perm longs + 2
    per doc/band — the 100 TB mode; adaptive exact-below-the-bound
    payloads + band-excluded estimator, see module docstring).
    ``state_ttl_ms`` bounds the dedup horizon (see module docstring).

    ``trigger_available_now``: run as Trigger.AvailableNow — process
    everything currently in ``input_dir`` then stop (wait with
    ``awaitTermination()``). Incompatible with ``state_ttl_ms``
    (ValueError): with timers registered the engine keeps scheduling
    state-cleanup batches, so the run never terminates. A TTL query is
    ALWAYS-ON by nature — the engine triggers ~continuous batches to
    evaluate timers, ``processAllAvailable()`` never quiesces either;
    callers observe progress by polling the verdict sink and ``stop()``
    explicitly (see tests/test_stream_neardup.py::TestStateTTL).
    """
    if state_mode not in ("tokens", "signature"):
        raise ValueError(f"unknown state_mode {state_mode!r}")
    if trigger_available_now and state_ttl_ms is not None:
        raise ValueError(
            "trigger_available_now is incompatible with state_ttl_ms: "
            "pending timers keep scheduling cleanup batches, so an "
            "AvailableNow run never terminates — run TTL queries "
            "always-on and stop() explicitly"
        )
    signature_state = state_mode == "signature"
    stream = (
        spark.readStream.schema(DOCS_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
        .select("doc_id", "text")
    )
    band_stream = stream.mapInPandas(
        lambda it: _band_rows(it, num_perm, bands, seed, signature_state),
        schema=BAND_DDL,
    )
    verdicts = band_stream.groupBy("band_idx", "band_key").applyInPandasWithState(
        _make_bucket_update(threshold, state_ttl_ms, num_perm, bands, seed),
        outputStructType=VERDICT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        # TTL queries run ~continuous timer-evaluation batches that carry
        # no verdicts; writing those would accrete unbounded empty
        # epoch=N dirs that read_verdicts' glob must then enumerate —
        # skip them before any write happens
        if batch_df.isEmpty():
            return
        # all `bands` verdicts for a document arrive in its own trigger:
        # fold them here (min matching seen doc across bands); the
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

    writer = (
        verdicts.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_verdicts(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.schema(OUT_DDL).parquet(os.path.join(output_dir, "epoch=*"))


def state_store_bytes(checkpoint_dir: str, mode: str = "live") -> int:
    """On-disk size of the query's committed state store — the measured
    evidence for the tokens-vs-signature state-size comparison
    (bench_streaming.py reports both modes on the same corpus).

    ``mode="live"`` (default) approximates the CURRENT state: per state
    partition directory, the newest ``.snapshot`` plus every ``.delta``
    newer than it (a partition that has never snapshotted contributes all
    its deltas — each key's latest value appears in some delta, so this
    upper-bounds live state but never counts superseded snapshot
    history). ``mode="cumulative"`` sums every retained version — the
    full on-disk history, which grows with trigger count regardless of
    live state size."""
    root = os.path.join(checkpoint_dir, "state")
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        versioned: list[tuple[int, str, str]] = []
        for fn in filenames:
            stem, dot, ext = fn.partition(".")
            if dot and ext in ("delta", "snapshot") and stem.isdigit():
                versioned.append((int(stem), ext, os.path.join(dirpath, fn)))
        if not versioned:
            continue
        if mode == "cumulative":
            keep = [p for _v, _e, p in versioned]
        else:
            snaps = [v for v, e, _p in versioned if e == "snapshot"]
            floor_v = max(snaps) if snaps else -1
            keep = [
                p
                for v, e, p in versioned
                if (e == "snapshot" and v == floor_v)
                or (e == "delta" and v > floor_v)
            ]
        for p in keep:
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
    return total
