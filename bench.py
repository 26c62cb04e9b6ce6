"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line.

Usage:
    python bench.py                  # headline bench, one JSON line on stdout
    python bench.py --explain        # also dump physical plans to BENCH/plans/
"""

from __future__ import annotations

import json
import os
import sys
import time

# make the repo importable for this process AND the executor python workers
# (which inherit PYTHONPATH through the JVM) when invoked from elsewhere
_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

# headline queries: the flagship KG path + the scale-relevant analytics ops.
# Every entry is the PRODUCTION (scale-safe) variant: doc_jaccard_pairs (the
# deliberately-quadratic exact reference) was demoted in round 2 to an
# oracle-validation query — its headline slot is the sub-quadratic
# LSH pair + clustering path it validates.
HEADLINE = [
    "kg_transcripts",
    "kg_entity_mentions",
    "kg_triples",
    "kg_triples_fused",
    "kg_coref_clusters",
    "kg_triples_enriched",
    "kg_compound_triples",
    "doc_minhash_pairs",
    "doc_dedup_clusters_lsh",
    "doc_token_topk",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_volume",
    "events_sessions",
    "events_range_join",
    "emb_cosine_topk",
    # round 3: the blocked near-dup pairs production path and the
    # multi-token (Aho-Corasick) dictionary path
    "emb_near_dup_lsh",
    "kg_triples_multitok",
    # round 6: the graph-analytics consumer tier over the materialized KG
    # and the heaviest text-curation extension (two-shuffle TF-IDF + top-k)
    "kg_entity_degree",
    "kg_pagerank",
    "doc_tfidf_topterms",
    # round 7: span-level dedup (the winnowed scale path), real trained-BPE
    # token accounting, and the k-core community backbone
    "doc_span_matches_winnowed",
    "doc_bpe_real_tokens",
    "kg_kcore",
]

# plan/metrics dumps WITHOUT a headline timing slot (--explain only):
# batch twins of maintained views and other evidence-index entries
EXPLAIN_EXTRA = [
    "kg_current_degree",
    "kg_current_predicates",
    "kg_label_prop",
    "doc_span_trim_plan",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    explain = "--explain" in sys.argv

    from mehari_spark.session import get_spark
    from mehari_spark.plans.queries import QUERIES

    spark = get_spark("mehari-spark-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: spin up the Python worker pool, JIT/codegen and the
    # parquet reader once, so the first headline query measures steady-state
    # work instead of session bring-up
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(256).mapInPandas(
        lambda it: it, schema="doc_id long, text string"
    ).count()
    spark.range(cores * 4).repartition(cores).mapInPandas(
        lambda it: it, schema="id long"
    ).count()  # spin up the whole Python worker pool, not just one worker

    # p50-of-3: run the whole headline loop three times and report the
    # per-query MEDIAN, so round-over-round deltas track the code, not the
    # ~±15% single-box noise (page cache, GC, daemons). Run 1 additionally
    # dumps plans under --explain. Construction + execution are both timed:
    # iterative operators (global CC) materialize eager checkpoints while
    # the plan is BUILT, so timing only the count would hide their cost.
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    from mehari_spark.plans.stagecache import clear_shared_stages

    for run_i in range(n_runs):
        # shared stages (e.g. the MinHash pairs both dedup queries consume)
        # are REAL pipeline reuse within a rep, but reuse across reps would
        # measure the cache, not the code: start each rep cold
        clear_shared_stages()
        for name in HEADLINE:
            fn, _oracle = QUERIES[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            if explain and run_i == 0:
                import contextlib
                import io

                os.makedirs("BENCH/plans", exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(f"BENCH/plans/{name}.txt", "w") as f:
                    f.write(buf.getvalue())
            n = df.count()
            dt = time.time() - t0
            runs[name].append(dt)
            print(f"# run{run_i} {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
            if explain and run_i == 0:
                # measured shuffle/broadcast totals — the EXPLAIN ANALYZE
                # evidence next to the static plan. Captured COLD: the
                # query is rebuilt with the shared-stage cache bypassed
                # (a persisted stage would report the InMemoryTableScan's
                # 0 exchanges, hiding the real exchange structure) and
                # executed untimed through its own queryExecution.
                from mehari_spark.plans.observe import summarize_exchange
                from mehari_spark.plans.stagecache import cache_disabled

                with cache_disabled():
                    # also unpersist: Spark's CacheManager substitutes the
                    # cached relation into ANY matching logical plan, so a
                    # fresh build alone would still read the warm blocks
                    clear_shared_stages()
                    metrics = summarize_exchange(fn(spark, sf_dir))
                with open(f"BENCH/plans/{name}.metrics.json", "w") as f:
                    json.dump({"rows": n, "capture": "cold", **metrics}, f)

    if explain:
        import contextlib
        import io

        from mehari_spark.plans.observe import summarize_exchange
        from mehari_spark.plans.stagecache import cache_disabled

        for name in EXPLAIN_EXTRA:
            fn, _oracle = QUERIES[name]
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"BENCH/plans/{name}.txt", "w") as f:
                f.write(buf.getvalue())
            with cache_disabled():
                clear_shared_stages()
                metrics = summarize_exchange(fn(spark, sf_dir))
            with open(f"BENCH/plans/{name}.metrics.json", "w") as f:
                json.dump({"rows": df.count(), "capture": "cold", **metrics}, f)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2

    timings = {name: round(median(ts), 3) for name, ts in runs.items()}
    total = sum(timings.values())

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "runs_per_query": n_runs,
                "spread": {
                    name: [round(t, 3) for t in ts] for name, ts in runs.items()
                },
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
