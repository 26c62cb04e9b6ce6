"""Sketch aggregates: measured error gates against the exact twins
computed in the same pass, plus the no-row-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.operators.sketch import (
    token_distinct_profile,
    token_length_quantiles,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


class TestSketches:
    def test_hll_relative_error_within_bound(self, spark):
        rows = token_distinct_profile(
            _docs(spark), rsd=0.02, include_sketch=True
        ).collect()
        assert rows  # at least one language group
        for r in rows:
            rel = abs(r.hll_distinct - r.exact_distinct) / max(r.exact_distinct, 1)
            # 3 sigma of the configured rsd — generous but measured
            assert rel <= 3 * 0.02, (r.lang, r.exact_distinct, r.hll_distinct)
            assert r.hll_ok  # the oracle-checked gate agrees

    def test_quantile_sketch_tracks_exact(self, spark):
        rows = token_length_quantiles(
            _docs(spark), accuracy=1000, include_sketch=True
        ).collect()
        assert rows
        for r in rows:
            exacts = [r.p50_tokens, r.p90_tokens, r.p99_tokens]
            for exact, approx in zip(exacts, r.approx_pct):
                # GK returns a real element; exact is nearest-rank — allow
                # the rank gap plus 5% relative slack
                assert abs(approx - exact) <= max(2.0, 0.05 * exact), (
                    r.lang, exacts, r.approx_pct,
                )
            assert r.approx_ok

    def test_oracle_gate_columns_are_oracle_safe(self, spark):
        """Registry outputs carry no raw sketch values — only exact
        integers and boolean gates, so the DuckDB value-hash is stable."""
        hll = token_distinct_profile(_docs(spark))
        qnt = token_length_quantiles(_docs(spark))
        assert set(hll.columns) == {"lang", "exact_distinct", "n_tokens", "hll_ok"}
        assert set(qnt.columns) == {
            "lang", "n_docs", "p50_tokens", "p90_tokens", "p99_tokens", "approx_ok"
        }

    def test_sketch_runs_as_streaming_agg(self, spark, tmp_path):
        """Sketches ARE streaming-aggregation state: the same HLL
        aggregation runs unchanged over a file stream (complete mode) and
        converges to the batch estimate once all files are consumed."""
        docs = _docs(spark).limit(200)
        in_dir, ck = str(tmp_path / "in"), str(tmp_path / "ck")
        docs.write.mode("append").parquet(in_dir)
        stream = (
            spark.readStream.schema("doc_id long, lang string, text string")
            .option("maxFilesPerTrigger", "2")
            .parquet(in_dir)
            .select("lang", F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("lang")
            .agg(F.approx_count_distinct("tok", 0.02).alias("hll"))
        )
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName("hll_stream")
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r.lang: r.hll for r in spark.sql("SELECT * FROM hll_stream").collect()
        }
        want = {
            r.lang: r.hll
            for r in docs.select(
                "lang", F.explode(F.split("text", " ")).alias("tok")
            )
            .groupBy("lang")
            .agg(F.approx_count_distinct("tok", 0.02).alias("hll"))
            .collect()
        }
        assert got == want  # same sketch, same estimate, streaming == batch

    def test_sketch_shuffles_state_exact_shuffles_rows(self, spark):
        """The scale argument, plan-asserted: the sketch-only aggregation
        shuffles one round of fixed-size SKETCH STATE per (partition,
        lang); the exact countDistinct twin needs an extra exchange keyed
        on (lang, tok) — a shuffle of the exploded token rows themselves,
        O(corpus) at 100 TB. Dropping the exact column removes it."""
        toks = _docs(spark).select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        sketch_only = toks.groupBy("lang").agg(
            F.approx_count_distinct("tok", 0.02).alias("hll")
        )
        p_sketch = sketch_only._jdf.queryExecution().executedPlan().toString()
        assert p_sketch.count("Exchange hashpartitioning") == 1
        assert "partial_approx_count_distinct" in p_sketch
        p_exact = (
            token_distinct_profile(_docs(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert p_exact.count("Exchange hashpartitioning") == 2  # rows moved
