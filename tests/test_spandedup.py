"""Cross-document span-level exact substring dedup: planted shared
passages found with exact offsets, winnowed path equals the exact path at
the guarantee threshold, winnowing-guarantee property, df-cap behavior."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mehari_spark.kernels.fingerprint import (
    fingerprint_postings,
    rolling_hashes,
    winnow_with_pos,
)
from mehari_spark.operators.spandedup import (
    gram_postings,
    span_dup_mass,
    span_matches,
    span_matches_winnowed,
    winnowed_postings,
)

from .conftest import SF_UNIT

K, W = 24, 8
MIN_LEN = K + W - 1  # winnowing guarantee threshold


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz .,") for _ in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sorted(df):
    cols = sorted(df.columns)
    return (
        df.toPandas()[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )


class TestSpanDedup:
    def test_planted_passage_exact_offsets(self, spark):
        """A 60-char passage planted at known offsets in two otherwise
        random documents is reported by BOTH paths with exact (start_a,
        start_b, span_len)."""
        rng = random.Random(7)
        passage = _rand_text(rng, 60)
        a = _rand_text(rng, 100) + passage + _rand_text(rng, 50)
        b = _rand_text(rng, 30) + passage + _rand_text(rng, 120)
        docs = _docs(spark, [(1, a), (2, b)])
        want = (1, 2, 101, 31, 60)
        for path in (span_matches(docs, k=K),
                     span_matches_winnowed(docs, k=K, w=W)):
            rows = [tuple(r) for r in path.collect()]
            assert want in rows, rows
            # nothing longer than the plant (random flanks don't extend it)
            assert all(r[4] <= 60 for r in rows)

    def test_winnowed_equals_exact_at_threshold(self, spark):
        """On the real documents table the winnowed+verify+extend path is
        IDENTICAL to the exact gram path filtered to span_len >= k+w-1 —
        the winnowing guarantee, checked end to end."""
        docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
        exact = span_matches(docs, k=K).where(F.col("span_len") >= MIN_LEN)
        winnowed = span_matches_winnowed(docs, k=K, w=W)
        e, w = _sorted(exact), _sorted(winnowed)
        assert len(e) > 0  # the testdata plants shared passages
        assert e.equals(w)

    def test_dup_mass_full_and_zero(self, spark):
        """An exact duplicate pair has dup_permille 1000; a unique random
        doc has 0."""
        rng = random.Random(11)
        dup = _rand_text(rng, 200)
        docs = _docs(
            spark, [(1, dup), (2, dup), (3, _rand_text(rng, 200))]
        )
        got = {r.doc_id: r for r in span_dup_mass(docs, k=16).collect()}
        assert got[1].dup_permille == 1000
        assert got[2].dup_permille == 1000
        assert got[3].dup_grams == 0
        assert got[1].n_grams == 200 - 16 + 1

    def test_hashed_mass_equals_exact(self, spark):
        """The production hashed-gram gate form returns IDENTICAL rows to
        the exact-string form on the real documents table AND on a
        planted shared-passage corpus (xxhash64 collisions are the only
        possible divergence — vanishingly unlikely at these sizes)."""
        from mehari_spark.operators.spandedup import span_dup_mass_hashed

        docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
        assert _sorted(span_dup_mass(docs, k=16)).equals(
            _sorted(span_dup_mass_hashed(docs, k=16))
        )
        rng = random.Random(23)
        passage = _rand_text(rng, 120)
        planted = _docs(
            spark,
            [
                (1, _rand_text(rng, 40) + passage),
                (2, passage + _rand_text(rng, 300)),
                (3, _rand_text(rng, 150)),
                (4, "tiny"),
            ],
        )
        assert _sorted(span_dup_mass(planted, k=16)).equals(
            _sorted(span_dup_mass_hashed(planted, k=16))
        )

    def test_short_and_null_text(self, spark):
        """Documents shorter than k (or null) emit no grams/postings and
        never crash either path."""
        docs = _docs(spark, [(1, "tiny"), (2, None), (3, "x" * 30)])
        assert gram_postings(docs, K).where(F.col("doc_id") <= 2).count() == 0
        assert winnowed_postings(docs, K, W).where(
            F.col("doc_id") <= 2
        ).count() == 0
        assert span_matches(docs, k=K).count() == 0
        assert span_matches_winnowed(docs, k=K, w=W).count() == 0

    def test_max_df_drops_boilerplate(self, spark):
        """With max_df=2, a passage shared by 4 documents (boilerplate) is
        dropped from the index while a 2-document passage is still found."""
        rng = random.Random(13)
        boiler = _rand_text(rng, 80)
        rare = _rand_text(rng, 80)
        rows = [(i, _rand_text(rng, 40) + boiler + _rand_text(rng, 40))
                for i in range(4)]
        rows += [(10, _rand_text(rng, 40) + rare),
                 (11, rare + _rand_text(rng, 40))]
        docs = _docs(spark, rows)
        got = span_matches(docs, k=K, max_df=2).collect()
        pairs = {(r.doc_a, r.doc_b) for r in got}
        assert (10, 11) in pairs
        assert all(a >= 10 for a, _ in pairs)  # boilerplate pairs gone
        got_w = span_matches_winnowed(docs, k=K, w=W, max_df=2).collect()
        assert {(r.doc_a, r.doc_b) for r in got_w} == {(10, 11)}

    def test_trim_plan_merges_overlapping_spans(self, spark):
        """Keep-first trim accounting: doc 3 shares two OVERLAPPING spans
        (one with doc 1, one with doc 2) — the trim must count their
        interval UNION once, and the lowest-id copies keep everything."""
        from mehari_spark.operators.spandedup import span_trim_plan

        rng = random.Random(19)
        p = _rand_text(rng, 120)
        # doc1 carries p[0:80], doc2 carries p[40:120]; doc3 carries all
        # of p -> its two matched spans [1,80] and [41,120] overlap
        docs = _docs(spark, [
            (1, p[:80] + _rand_text(rng, 40)),
            (2, _rand_text(rng, 40) + p[40:]),
            (3, p),
        ])
        got = {r.doc_id: r for r in span_trim_plan(docs, k=K).collect()}
        assert got[1].n_removed == 0
        # doc2 shares p[40:80] with doc1 (doc1 < doc2): 40 chars removed
        assert got[2].n_removed == 40
        # doc3: union of [1..80] and [41..120] = 120, NOT 80+80
        assert got[3].n_removed == 120
        assert got[3].n_kept == 0
        assert all(r.n_kept == r.n_chars - r.n_removed for r in got.values())

    def test_within_doc_repeats_not_reported(self, spark):
        """Repeated passages INSIDE one document are not cross-doc spans."""
        rng = random.Random(17)
        p = _rand_text(rng, 50)
        docs = _docs(spark, [(1, p + _rand_text(rng, 20) + p),
                             (2, _rand_text(rng, 120))])
        assert span_matches(docs, k=K).count() == 0


class TestWinnowKernel:
    def test_guarantee_property(self):
        """Any shared substring of length >= w + k - 1 yields at least one
        common (hash, in-span) posting in both documents — 50 random
        plants."""
        rng = random.Random(23)
        for trial in range(50):
            span_len = MIN_LEN + rng.randrange(0, 40)
            shared = _rand_text(rng, span_len)
            a = _rand_text(rng, rng.randrange(0, 60)) + shared + _rand_text(
                rng, rng.randrange(0, 60)
            )
            b = _rand_text(rng, rng.randrange(0, 60)) + shared + _rand_text(
                rng, rng.randrange(0, 60)
            )
            pa = a.index(shared) + 1
            pb = b.index(shared) + 1
            fa = {
                (pos - pa, h)
                for pos, h in fingerprint_postings(a, k=K, w=W)
                if pa <= pos <= pa + span_len - K
            }
            fb = {
                (pos - pb, h)
                for pos, h in fingerprint_postings(b, k=K, w=W)
                if pb <= pos <= pb + span_len - K
            }
            assert fa & fb, f"trial {trial}: no common in-span fingerprint"

    def test_positions_select_real_minima(self):
        """Every selected (pos, hash) is the hash of the gram at pos, and
        selections are strictly increasing in position."""
        rng = random.Random(29)
        t = _rand_text(rng, 300)
        hs = rolling_hashes(t, k=K)
        sel = winnow_with_pos(hs, w=W)
        assert sel == sorted(sel)
        assert len({p for p, _ in sel}) == len(sel)
        for pos, h in sel:
            assert hs[pos] == h

    def test_density(self):
        """Winnowing keeps ~2/(w+1) of the grams — assert the posting list
        is materially smaller than the full gram index."""
        rng = random.Random(31)
        t = _rand_text(rng, 2000)
        hs = rolling_hashes(t, k=K)
        sel = winnow_with_pos(hs, w=W)
        assert len(sel) < len(hs) * 0.4
        assert len(sel) > len(hs) * 0.1

    def test_empty_and_short(self):
        assert winnow_with_pos([], w=W) == []
        assert fingerprint_postings("", k=K, w=W) == []
        assert fingerprint_postings("abc", k=K, w=W) == []
        one = fingerprint_postings("x" * K, k=K, w=W)
        assert len(one) == 1 and one[0][0] == 1

    def test_vectorized_equals_scalar(self):
        """The numpy posting kernel (u64-wraparound prefix hashes +
        sliding-window rightmost-min winnow) emits EXACTLY the scalar
        reference's (pos, hash) postings — 40 random texts + edge sizes."""
        from mehari_spark.kernels.fingerprint import (
            gram_hashes_np,
            posting_arrays,
            rolling_hashes_u64,
        )

        rng = random.Random(41)
        texts = [_rand_text(rng, n) for n in
                 [0, K - 1, K, K + 1, K + W - 1, 50, 333, 2000]]
        texts += [_rand_text(rng, rng.randrange(K, 600)) for _ in range(40)]
        texts += ["a" * 100, ("ab" * 60)]  # degenerate periodic inputs
        for t in texts:
            want_h = rolling_hashes_u64(t, K)
            got_h = gram_hashes_np(t, K)
            assert [int(x) for x in got_h] == want_h
            pos, h = posting_arrays(t, K, W)
            want = fingerprint_postings(t, k=K, w=W)
            assert list(zip(pos.tolist(), h.tolist())) == want
