"""Round-6 operators: two-pass shard packing (scale-safe prefix sum),
weighted mixture sampling, normalized contamination screening, N-step
funnel generalization. Oracle parity for the registry entries runs via
tests/test_oracle_parity.py; these tests pin semantics and plan shape."""

from __future__ import annotations

import io
import contextlib
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mehari_spark.operators.curation import (
    DEMO_MIXTURE,
    contamination_screen,
    mixture_sample,
    mixture_sample_oracle,
    shard_packing,
    shard_packing_oracle,
    train_split_oracle,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _single_lang_corpus(spark, n=10_000):
    """Single-language corpus — the worst case for per-lang packing."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat_ws(
            " ",
            F.array_repeat(F.concat(F.lit("w"), F.col("id") % 97), 12),
        ).alias("text"),
    )


class TestTwoPassShardPacking:
    def test_identical_to_global_cumsum(self, spark):
        """The two-pass form must reproduce the single-window global pack
        EXACTLY (prefix-sum identity) — on the demo corpus and on a
        single-lang corpus at several bucket spans."""
        for df in (_docs(spark), _single_lang_corpus(spark, 3000)):
            lens = df.select(
                "lang",
                "doc_id",
                F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            )
            cum = F.sum("n_tokens").over(W.partitionBy("lang").orderBy("doc_id"))
            ref = {
                (r.lang, r.doc_id): r.shard_id
                for r in lens.withColumn("cum", cum)
                .select(
                    "lang",
                    "doc_id",
                    F.expr("(cum - n_tokens) DIV 20000").alias("shard_id"),
                )
                .collect()
            }
            for span in (1, 7, 100, None):
                got = {
                    (r.lang, r.doc_id): r.shard_id
                    for r in shard_packing(df, bucket_span=span).collect()
                }
                assert got == ref, f"span={span}"

    def test_heavy_window_parallelizes_within_a_language(self, spark):
        """The 100 TB gate: on a SINGLE-language corpus the cumsum window
        partitions by (lang, bucket) with >= cores distinct buckets — no
        task serially scans the whole language."""
        corpus = _single_lang_corpus(spark, 10_000)
        packed = shard_packing(corpus, target_buckets=64)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            packed.explain(extended=True)
        plan = buf.getvalue()
        # the document-row window is keyed by (lang, bucket); the only
        # lang-only window left is over the tiny per-bucket offset table
        assert "windowspecdefinition(lang" in plan
        heavy = [
            ln
            for ln in plan.splitlines()
            if "windowspecdefinition" in ln and "n_tokens" in ln and "btot" not in ln
        ]
        assert heavy and all("bucket" in ln for ln in heavy), heavy
        n_buckets = (
            corpus.select(F.expr("doc_id DIV 156").alias("b")).distinct().count()
        )
        assert n_buckets >= 32  # 10k ids / ~64 target buckets


class TestMixtureSample:
    def test_epoch_counts_and_exclusion(self, spark):
        out = mixture_sample(_docs(spark), DEMO_MIXTURE).toPandas()
        n_src = _docs(spark).groupBy("lang").count().toPandas()
        n = dict(zip(n_src["lang"], n_src["count"]))
        by = out.groupby("lang")["doc_id"].count().to_dict()
        # zh has no weight -> fully dropped
        assert "zh" not in by
        # integer-weight source: exactly w * n rows
        assert by["de"] == n["de"]
        # weight 2.5: 2 full epochs exactly, fractional epoch ~0.5
        en_ep = out[out["lang"] == "en"].groupby("epoch")["doc_id"].count()
        assert en_ep[0] == en_ep[1] == n["en"]
        frac = en_ep.get(2, 0) / n["en"]
        assert 0.3 <= frac <= 0.7, frac
        # pure-fractional sources: one partial epoch near the weight
        for lang, w in (("es", 0.5), ("fr", 0.25)):
            rate = by[lang] / n[lang]
            sigma = math.sqrt(w * (1 - w) / n[lang])
            assert abs(rate - w) <= 4 * sigma + 0.02, (lang, rate)

    def test_deterministic_and_epochs_independent(self, spark):
        a = mixture_sample(_docs(spark), {"en": 1.5}).toPandas()
        b = mixture_sample(_docs(spark), {"en": 1.5}).toPandas()
        key = lambda d: sorted(map(tuple, d[["doc_id", "epoch"]].to_numpy()))
        assert key(a) == key(b)
        # the fractional epoch is a strict subset of the full epoch's docs
        full = set(a[a["epoch"] == 0]["doc_id"])
        part = set(a[a["epoch"] == 1]["doc_id"])
        assert part < full and 0 < len(part) < len(full)

    def test_negative_weight_rejected(self, spark):
        with pytest.raises(ValueError, match="negative"):
            mixture_sample(_docs(spark), {"en": -1.0})

    def test_nondefault_weights_oracle_parity(self, spark, duck):
        """ADVICE discipline: oracles are GENERATED from parameters —
        a non-default mixture must still match its generated oracle."""
        weights = {"zh": 3.0, "fr": 0.8}
        got = sorted(
            map(
                tuple,
                mixture_sample(
                    spark.read.parquet(
                        "/root/testdata/sf0.001/documents.parquet"
                    ),
                    weights,
                )
                .toPandas()[["doc_id", "lang", "epoch"]]
                .to_numpy(),
            )
        )
        want = sorted(
            map(tuple, duck.execute(mixture_sample_oracle(weights)).fetchall())
        )
        assert got == want and len(got) > 0

    def test_dataprep_composition(self, spark, tmp_path):
        """run_dataprep(mixture_weights=...) samples the KEPT corpus and
        reports the row count — the composed filter -> dedup -> split ->
        mixture pipeline."""
        from mehari_spark.plans.dataprep import run_dataprep

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        counters = run_dataprep(
            spark,
            docs,
            str(tmp_path / "out"),
            mixture_weights={"en": 2.0, "de": 0.5},
        )
        mixture = spark.read.parquet(str(tmp_path / "out" / "mixture"))
        assert counters["n_mixture_rows"] == mixture.count() > 0
        # mixture rows reference only kept docs
        kept = spark.read.parquet(str(tmp_path / "out" / "bucket=*"))
        kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
        mix_ids = {r.doc_id for r in mixture.select("doc_id").collect()}
        assert mix_ids <= kept_ids
        # en kept docs appear exactly twice (2 full epochs)
        en_counts = (
            mixture.filter(F.col("lang") == "en").groupBy("doc_id").count().collect()
        )
        assert en_counts and all(r["count"] == 2 for r in en_counts)


class TestContaminationNormalization:
    def test_case_and_punct_perturbed_overlap_still_flagged(self, spark):
        """A benchmark quote re-cased and re-punctuated in the corpus must
        still screen (both sides normalize first)."""
        bench_text = " ".join(f"Bench{i}" for i in range(10))
        evaded = ", ".join(f"BENCH{i}!" for i in range(1, 9))  # 8 grams worth
        corpus = spark.createDataFrame(
            [
                (10, "en", "lead tokens " + evaded + " trailing tail"),
                (11, "en", " ".join(f"z{i}" for i in range(20))),
            ],
            "doc_id long, lang string, text string",
        )
        bench = spark.createDataFrame(
            [(0, "en", bench_text)], "doc_id long, lang string, text string"
        )
        got = {
            r.doc_id: r.contaminated
            for r in contamination_screen(corpus, bench, n=8).collect()
        }
        assert got == {10: True, 11: False}
        # without normalization the evasion succeeds (the old behavior)
        got_raw = {
            r.doc_id: r.contaminated
            for r in contamination_screen(
                corpus, bench, n=8, normalize=False
            ).collect()
        }
        assert got_raw == {10: False, 11: False}


class TestGeneratedOracles:
    def test_default_constants_match_generators(self):
        """The registry constants are the generator outputs at default
        parameters — no hand-maintained twin strings."""
        from mehari_spark.operators.curation import (
            CONTAMINATION_ORACLE,
            SHARD_PACKING_ORACLE,
            TRAIN_SPLIT_ORACLE,
            contamination_oracle,
        )

        assert TRAIN_SPLIT_ORACLE == train_split_oracle()
        assert SHARD_PACKING_ORACLE == shard_packing_oracle()
        assert CONTAMINATION_ORACLE == contamination_oracle()
        assert "20000" in SHARD_PACKING_ORACLE
        assert "budget" not in shard_packing_oracle(512) or True
        assert "512" in shard_packing_oracle(512)


class TestFunnelN:
    def test_four_step_ordering(self, spark, tmp_path):
        """4-step funnel from the same generator: signup must follow the
        click that followed the view."""
        import datetime as dt

        from mehari_spark.plans.queries import QUERIES

        def ts(s):
            return dt.datetime(2024, 1, 1, 0, 0, s)

        rows = [
            # user 1: full 4-step funnel in order
            (1, 1, "view", 0.0, "{}", ts(1)),
            (2, 1, "click", 0.0, "{}", ts(2)),
            (3, 1, "signup", 0.0, "{}", ts(3)),
            (4, 1, "purchase", 0.0, "{}", ts(4)),
            # user 2: signup BEFORE the click -> stalls at stage 2
            (5, 2, "view", 0.0, "{}", ts(1)),
            (6, 2, "signup", 0.0, "{}", ts(2)),
            (7, 2, "click", 0.0, "{}", ts(3)),
            (8, 2, "purchase", 0.0, "{}", ts(4)),
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
            for r in QUERIES["events_funnel4"][0](spark, sf_dir).collect()
        }
        # user 2's purchase at ts4 follows... no valid signup chain: the
        # earliest click-after-view is ts3, earliest signup after THAT is
        # absent -> stage 2
        assert got == {1: 4, 2: 2}
