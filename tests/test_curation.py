"""Dataset-assembly operators: split determinism/leakage guard, shard
packing budget properties, contamination screening. Oracle parity runs
via the parametrized tests/test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.operators.curation import (
    contamination_screen,
    shard_packing,
    train_split,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


class TestTrainSplit:
    def test_proportions_and_determinism(self, spark):
        rows = train_split(_docs(spark)).collect()
        frac = {
            s: sum(1 for r in rows if r.split == s) / len(rows)
            for s in ("train", "val", "test")
        }
        assert 0.80 <= frac["train"] <= 0.95, frac
        assert frac["val"] + frac["test"] <= 0.20
        again = {r.doc_id: r.split for r in train_split(_docs(spark)).collect()}
        assert {r.doc_id: r.split for r in rows} == again

    def test_exact_duplicates_share_a_split(self, spark):
        # the leakage guard: same CONTENT -> same split, whatever the id
        dup = spark.createDataFrame(
            [(1, "en", "a b c"), (999, "en", "a b c"), (2, "en", "x y z")],
            "doc_id long, lang string, text string",
        )
        got = {r.doc_id: r.split for r in train_split(dup).collect()}
        assert got[1] == got[999]


class TestShardPacking:
    def test_budget_property_and_contiguity(self, spark):
        budget = 20_000
        rows = shard_packing(_docs(spark), budget=budget).collect()
        by_shard: dict[tuple, list] = {}
        for r in rows:
            by_shard.setdefault((r.lang, r.shard_id), []).append(r.n_tokens)
        for (lang, sid), toks in by_shard.items():
            # greedy pack: a shard overflows by at most its last doc
            assert sum(toks) <= budget + max(toks), (lang, sid, sum(toks))
        # shard ids contiguous from 0 per lang
        langs = {r.lang for r in rows}
        for lang in langs:
            sids = sorted({r.shard_id for r in rows if r.lang == lang})
            assert sids == list(range(len(sids))), (lang, sids)

    def test_every_doc_assigned_once(self, spark):
        rows = shard_packing(_docs(spark)).collect()
        assert len({r.doc_id for r in rows}) == len(rows) == _docs(spark).count()


class TestContamination:
    def test_planted_overlap_flagged_disjoint_not(self, spark):
        bench_text = " ".join(f"b{i}" for i in range(12))
        overlap_8 = " ".join(f"b{i}" for i in range(2, 10))  # 8-gram of bench
        corpus = spark.createDataFrame(
            [
                (10, "en", "lead tokens " + overlap_8 + " trailing"),
                (11, "en", " ".join(f"z{i}" for i in range(20))),
            ],
            "doc_id long, lang string, text string",
        )
        bench = spark.createDataFrame(
            [(0, "en", bench_text)], "doc_id long, lang string, text string"
        )
        got = {
            r.doc_id: (r.n_shared, r.contaminated)
            for r in contamination_screen(corpus, bench).collect()
        }
        assert got[10][1] and got[10][0] >= 1
        assert got[11] == (0, False)

    def test_benchmark_docs_excluded_from_output(self, spark):
        docs = _docs(spark)
        out = contamination_screen(docs, docs.filter(F.col("doc_id") < 5))
        ids = {r.doc_id for r in out.select("doc_id").collect()}
        assert ids.isdisjoint({0, 1, 2, 3, 4})
        assert len(ids) == docs.count() - 5


class TestEventsFunnel:
    def test_strict_ordering_semantics(self, spark, tmp_path):
        """A click BEFORE the first view does not count; stages are
        completed strictly in order."""
        import datetime as dt

        from mehari_spark.plans.queries import QUERIES

        def ts(s):
            return dt.datetime(2024, 1, 1, 0, 0, s)

        rows = [
            # user 1: full funnel in order
            (1, 1, "view", 0.0, "{}", ts(1)),
            (2, 1, "click", 0.0, "{}", ts(2)),
            (3, 1, "purchase", 0.0, "{}", ts(3)),
            # user 2: click precedes the only view -> stage stops at 1
            (4, 2, "click", 0.0, "{}", ts(1)),
            (5, 2, "view", 0.0, "{}", ts(2)),
            (6, 2, "purchase", 0.0, "{}", ts(0)),  # also too early
            # user 3: no funnel events at all
            (7, 3, "error", 0.0, "{}", ts(1)),
            # user 4: view+click ordered, purchase between them -> stage 2
            (8, 4, "view", 0.0, "{}", ts(1)),
            (9, 4, "purchase", 0.0, "{}", ts(2)),
            (10, 4, "click", 0.0, "{}", ts(3)),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, value double,"
            " props string, ts timestamp",
        )
        sf_dir = str(tmp_path)
        df.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
        got = {
            r.user_id: r.stage
            for r in QUERIES["events_funnel"][0](spark, sf_dir).collect()
        }
        assert got == {1: 3, 2: 1, 3: 0, 4: 2}
