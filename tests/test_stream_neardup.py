"""Streaming near-dup (MinHash-LSH) dedup: agreement with the batch LSH
path, transitive-chain keep-first, and keep-first across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.streaming.neardup_stream import (
    DOCS_DDL,
    read_verdicts,
    stream_neardup_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def _near_text(base: str, i: int) -> str:
    """base text with one token appended — high-Jaccard near-dup of base."""
    return base + f" v{i}"


class TestStreamingNearDup:
    def test_agrees_with_batch_lsh_verdicts(self, spark, tmp_path):
        """The streaming dropped set == {doc_b of batch minhash_lsh_pairs}
        on a real corpus fed in doc_id order (two chunks)."""
        from mehari_spark.operators.dedup import minhash_lsh_pairs

        from .conftest import SF_UNIT

        docs = (
            spark.read.parquet(f"{SF_UNIT}/documents.parquet")
            .select("doc_id", "lang", "text")
            .limit(300)
        )
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        docs.filter(F.col("doc_id") < 150).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.9)
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= 150).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        streamed_dropped = {
            r.doc_id for r in read_verdicts(spark, out_dir).filter("NOT is_new").collect()
        }
        batch_dropped = {
            r.doc_b
            for r in minhash_lsh_pairs(docs, threshold=0.9).select("doc_b").collect()
        }
        assert streamed_dropped == batch_dropped
        # every doc got exactly one verdict row
        assert read_verdicts(spark, out_dir).count() == docs.count()

    def test_transitive_chain_and_dup_of(self, spark, tmp_path):
        """A~B and B~C but A!~C: B and C both dropped (dropped docs stay in
        the seen set), and dup_of points at the earliest similar doc."""
        base = " ".join(f"tok{i}" for i in range(40))
        a = base
        b = base + " x1 x2"          # J(a,b) = 40/42 ~ 0.952
        c = base + " x1 x2 x3 x4"    # J(b,c) = 42/44 ~ 0.955, J(a,c) = 40/44 ~ 0.909
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(1, "en", a)]).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q.processAllAvailable()
        _docs(spark, [(2, "en", b)]).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        _docs(spark, [(3, "en", c)]).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        rows = {r.doc_id: r for r in read_verdicts(spark, out_dir).collect()}
        assert rows[1].is_new
        assert not rows[2].is_new and rows[2].dup_of == 1
        # C only matches B (J >= 0.95) — the dropped B still caught it
        assert not rows[3].is_new and rows[3].dup_of == 2

    def test_keep_first_across_restart(self, spark, tmp_path):
        """State survives a stop/restart: a post-restart near-dup of a
        pre-restart doc is dropped, a novel doc is kept — exactly once."""
        base = " ".join(f"w{i}" for i in range(50))
        other = " ".join(f"z{i}" for i in range(50))
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(1, "en", base), (2, "en", other)]).write.mode(
            "append"
        ).parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q.processAllAvailable()
        q.stop()
        # restart: near-dup of doc 1, near-dup of doc 2, one novel doc
        novel = " ".join(f"q{i}" for i in range(50))
        _docs(
            spark,
            [
                (3, "en", _near_text(base, 1)),
                (4, "en", _near_text(other, 2)),
                (5, "en", novel),
            ],
        ).write.mode("append").parquet(in_dir)
        q2 = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q2.processAllAvailable()
        q2.stop()

        rows = {r.doc_id: (r.is_new, r.dup_of) for r in read_verdicts(spark, out_dir).collect()}
        assert rows == {
            1: (True, None),
            2: (True, None),
            3: (False, 1),
            4: (False, 2),
            5: (True, None),
        }


class TestSignatureStateMode:
    def test_signature_mode_agrees_with_batch_on_demo_corpus(
        self, spark, tmp_path
    ):
        """The previously-documented short-set caveat is CLOSED: in
        signature mode, docs with <= num_perm distinct tokens store their
        exact token-hash set (no bigger than the signature — state stays
        bounded) and re-rank exactly, so the all-short sf0.001 demo
        corpus produces batch-identical verdicts in the bounded-state
        mode too."""
        from mehari_spark.operators.dedup import minhash_lsh_pairs

        from .conftest import SF_UNIT

        docs = (
            spark.read.parquet(f"{SF_UNIT}/documents.parquet")
            .select("doc_id", "lang", "text")
            .limit(300)
        )
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        docs.filter(F.col("doc_id") < 150).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(
            spark, in_dir, out_dir, ck, threshold=0.9, state_mode="signature"
        )
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= 150).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()
        streamed_dropped = {
            r.doc_id
            for r in read_verdicts(spark, out_dir).filter("NOT is_new").collect()
        }
        batch_dropped = {
            r.doc_b
            for r in minhash_lsh_pairs(docs, threshold=0.9).select("doc_b").collect()
        }
        assert streamed_dropped == batch_dropped
        assert read_verdicts(spark, out_dir).count() == docs.count()

    def test_signature_state_agrees_with_batch(self, spark, tmp_path):
        """Long-doc regime (200+ distinct tokens > num_perm -> true
        signature payloads): on a margin-clear corpus (near-dups J~0.985,
        background far below threshold — the shape of a real long-doc
        corpus) the band-excluded estimated-Jaccard re-rank yields the
        SAME dropped set as the batch exact path at threshold 0.95,
        deterministic under the fixed seed. Residual tolerance: sig-vs-sig
        pairs within ~2 estimator sigma (sqrt(J(1-J)/112) ~ 0.02) of the
        threshold may flip — short docs are exact and cannot."""
        from mehari_spark.operators.dedup import minhash_lsh_pairs

        rows = []
        did = 0
        for b in range(20):
            base = " ".join(f"b{b}t{i}" for i in range(200))
            rows.append((did, "en", base)); did += 1
            for c in range(2):  # J(base, copy) = 200/203 ~ 0.985
                rows.append(
                    (did, "en", base + f" b{b}c{c}x b{b}c{c}y b{b}c{c}z")
                )
                did += 1
        docs = _docs(spark, rows)
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        docs.filter(F.col("doc_id") < 30).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(
            spark, in_dir, out_dir, ck, threshold=0.95, state_mode="signature"
        )
        q.processAllAvailable()
        docs.filter(F.col("doc_id") >= 30).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()

        streamed_dropped = {
            r.doc_id
            for r in read_verdicts(spark, out_dir).filter("NOT is_new").collect()
        }
        batch_dropped = {
            r.doc_b
            for r in minhash_lsh_pairs(docs, threshold=0.95).select("doc_b").collect()
        }
        assert streamed_dropped == batch_dropped
        assert len(streamed_dropped) == 40  # 2 copies x 20 bases dropped
        assert read_verdicts(spark, out_dir).count() == docs.count()

    def test_signature_state_is_smaller_and_constant(self, spark, tmp_path):
        """Measured, not asserted: on long documents the signature-mode
        state store is a fraction of the tokens-mode store on the SAME
        corpus (payload is 128 longs per doc/band regardless of doc
        length)."""
        from mehari_spark.streaming.neardup_stream import state_store_bytes

        base = " ".join(f"tok{i}" for i in range(600))  # long docs
        rows = [(i, "en", base + f" u{i}a u{i}b u{i}c") for i in range(40)]
        sizes = {}
        for mode in ("tokens", "signature"):
            in_dir = str(tmp_path / f"in_{mode}")
            out_dir = str(tmp_path / f"out_{mode}")
            ck = str(tmp_path / f"ck_{mode}")
            _docs(spark, rows).write.mode("append").parquet(in_dir)
            q = stream_neardup_dedup(
                spark, in_dir, out_dir, ck, threshold=0.95, state_mode=mode
            )
            q.processAllAvailable()
            q.stop()
            sizes[mode] = state_store_bytes(ck)
        assert sizes["signature"] > 0
        # 600+-token payloads vs 128-long signatures: > 2x on-disk shrink
        assert sizes["signature"] * 2 < sizes["tokens"], sizes


class TestStateTTL:
    """A TTL query is ALWAYS-ON: with timers registered the engine
    schedules ~continuous state-cleanup batches, so processAllAvailable
    never quiesces (and an AvailableNow run never terminates — the
    operator rejects that combination). Tests poll the verdict sink for
    progress and stop() explicitly — the same observation pattern an
    always-on ingest deployment uses."""

    @staticmethod
    def _wait_for_verdicts(spark, out_dir, want_ids, timeout_s=90):
        import time as _time

        t0 = _time.time()
        while _time.time() - t0 < timeout_s:
            try:
                got = {r.doc_id for r in read_verdicts(spark, out_dir).collect()}
                if want_ids <= got:
                    return
            except Exception:
                pass  # sink dir mid-write / not yet created
            _time.sleep(0.5)
        raise AssertionError(f"verdicts for {want_ids} not seen in {timeout_s}s")

    def test_ttl_purges_idle_buckets(self, spark, tmp_path):
        """Bounded dedup horizon: a bucket idle past the TTL is purged by
        a cleanup batch, after which a near-dup of the forgotten doc is
        KEPT (and still gets exactly one verdict row)."""
        import time as _time

        base = " ".join(f"w{i}" for i in range(50))
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(1, "en", base)]).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(
            spark, in_dir, out_dir, ck, threshold=0.95, state_ttl_ms=2000
        )
        try:
            self._wait_for_verdicts(spark, out_dir, {1})
            _time.sleep(6.0)  # > TTL: cleanup batches purge doc 1's buckets
            # near-dup of the FORGOTTEN doc 1 -> kept
            _docs(spark, [(3, "en", base + " v1")]).write.mode("append").parquet(in_dir)
            self._wait_for_verdicts(spark, out_dir, {1, 3})
        finally:
            q.stop()
        rows = {r.doc_id: (r.is_new, r.dup_of) for r in read_verdicts(spark, out_dir).collect()}
        assert rows == {1: (True, None), 3: (True, None)}

    def test_within_horizon_still_drops(self, spark, tmp_path):
        """Sanity twin: with a generous TTL the dup arriving inside the
        horizon is still dropped."""
        base = " ".join(f"w{i}" for i in range(50))
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(1, "en", base)]).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(
            spark, in_dir, out_dir, ck, threshold=0.95, state_ttl_ms=600_000
        )
        try:
            self._wait_for_verdicts(spark, out_dir, {1})
            _docs(spark, [(2, "en", base + " v1")]).write.mode("append").parquet(in_dir)
            self._wait_for_verdicts(spark, out_dir, {1, 2})
        finally:
            q.stop()
        rows = {r.doc_id: (r.is_new, r.dup_of) for r in read_verdicts(spark, out_dir).collect()}
        assert rows == {1: (True, None), 2: (False, 1)}

    def test_available_now_with_ttl_rejected(self, spark, tmp_path):
        import pytest

        with pytest.raises(ValueError, match="never terminates"):
            stream_neardup_dedup(
                spark,
                str(tmp_path / "in"),
                str(tmp_path / "out"),
                str(tmp_path / "ck"),
                state_ttl_ms=1000,
                trigger_available_now=True,
            )


class TestArrivalOrderRobustness:
    def test_out_of_order_arrival_drops_later_arrival(self, spark, tmp_path):
        """Higher-id doc arrives FIRST: verdicts are keep-first-ARRIVAL —
        doc 5 (first) is kept, doc 3 (later, similar) is dropped with
        dup_of=5. The kept set stays near-dup-free under any order."""
        base = " ".join(f"w{i}" for i in range(50))
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        _docs(spark, [(5, "en", base)]).write.mode("append").parquet(in_dir)
        q = stream_neardup_dedup(spark, in_dir, out_dir, ck, threshold=0.95)
        q.processAllAvailable()
        _docs(spark, [(3, "en", base + " v1")]).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        q.stop()
        rows = {r.doc_id: (r.is_new, r.dup_of) for r in read_verdicts(spark, out_dir).collect()}
        assert rows == {5: (True, None), 3: (False, 5)}


class TestReplayWriter:
    def test_sequential_chunks_feed_triggers_in_order(self, spark, tmp_path):
        """write_arrival_chunk + maxFilesPerTrigger=1: chunks written out
        of doc_id order across calls still arrive in CALL order (one file
        per wave, sequential names = sequential mtimes), so keep-first-
        arrival verdicts are reproducible."""
        from mehari_spark.streaming.replay import write_arrival_chunk

        base = " ".join(f"w{i}" for i in range(50))
        in_dir, out_dir, ck = (
            str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
        )
        p1 = write_arrival_chunk(_docs(spark, [(7, "en", base)]), in_dir)
        p2 = write_arrival_chunk(
            _docs(spark, [(3, "en", base + " v1")]), in_dir
        )
        assert [p1, p2] == sorted([p1, p2])  # name order == call order
        q = stream_neardup_dedup(
            spark, in_dir, out_dir, ck, max_files_per_trigger=1,
            threshold=0.95, trigger_available_now=True,
        )
        q.awaitTermination()
        rows = {r.doc_id: (r.is_new, r.dup_of) for r in read_verdicts(spark, out_dir).collect()}
        # doc 7 arrived first (its chunk precedes), so it is kept and the
        # later, lower-id near-dup defers to it
        assert rows == {7: (True, None), 3: (False, 7)}
