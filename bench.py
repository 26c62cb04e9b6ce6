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

# headline queries: the flagship KG path + the scale-relevant analytics ops
HEADLINE = [
    "kg_transcripts",
    "kg_entity_mentions",
    "kg_triples",
    "kg_triples_fused",
    "kg_coref_clusters",
    "doc_jaccard_pairs",
    "doc_minhash_pairs",
    "doc_token_topk",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_volume",
    "events_sessions",
    "emb_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    explain = "--explain" in sys.argv

    from mehari_spark.session import get_spark
    from mehari_spark.plans.queries import QUERIES

    spark = get_spark("mehari-spark-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn, _oracle = QUERIES[name]
        df = fn(spark, sf_dir)
        if explain:
            import contextlib
            import io

            os.makedirs("BENCH/plans", exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"BENCH/plans/{name}.txt", "w") as f:
                f.write(buf.getvalue())
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
