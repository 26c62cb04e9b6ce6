"""Two-parallelism scaling bench for the COMPOSED CURATION PIPELINE
(plans/dataprep.py run_dataprep: quality gate -> lang id -> exact + LSH
near-dup dedup -> token accounting -> CC -> sorted bucketed committed
write) — the round-3 verdict asked for an N-vs-4N leg on this mix, which
stresses Catalyst filters + Arrow signature kernels + band joins + CC
rounds + write I/O rather than the AC kernel the KG leg measures.

Same protocol as bench_scaling.py: identical enlarged input at local[N]
and local[4N] in fresh JVMs, docs/sec at both, efficiency =
(rate_4N/rate_N)/4, plus a compute-only (noop sink) decomposition.

Input enlargement: every replica's tokens are PREFIXED with the replica
index (a bijection per replica), so the natural near-dup structure of the
corpus is preserved WITHIN each replica but cross-replica Jaccard is 0 —
otherwise replicas of one doc form near-dup cliques and the candidate
pair count grows quadratically in the replication factor, measuring the
blow-up instead of the pipeline.

Usage: MEHARI_SPARK_LOCAL_DIR=/dev/shm/mehari-tmp SCALING_N=4 \
       DATAPREP_REPLICATE=16 python bench_scaling_dataprep.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import json, os, sys, time, uuid
cores = int(sys.argv[1]); sf_dir = sys.argv[2]; out = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "both"
out = os.path.join(out, uuid.uuid4().hex[:8])  # never resume a prior attempt
rep = int(os.environ.get("DATAPREP_REPLICATE", "16"))
from pyspark.sql import functions as F
from mehari_spark.session import get_spark
from mehari_spark.plans.dataprep import curate_documents, run_dataprep
from mehari_spark.operators.textstats import STOPWORDS
spark = get_spark(f"scaling-dp-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
if rep > 1:
    # tag every NON-stopword token with the replica index: a bijection per
    # replica, so token counts / distinct ratio / stopword hits (the
    # quality-gate bits) are preserved and the WITHIN-replica near-dup
    # structure is intact, while cross-replica Jaccard collapses to the
    # shared stopword set (far below the LSH knee) — no quadratic
    # replica cliques
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split("text", " "),
            lambda t: F.when(F.array_contains(stop_arr, t), t).otherwise(
                F.concat(t, F.lit("@"), F.col("_r"))),
        ),
    )
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    docs = (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("_r") * 1_000_000).alias("doc_id"),
                    "lang", tagged.alias("text")))
docs = docs.repartition(cores * 2).localCheckpoint(eager=True)
n_docs = docs.count()
# warmup (python workers, JIT, codegen) — steady state is what N vs 4N
# compares. Each MODE runs in its own JVM: the verdict plan materializes
# several eager localCheckpoints per execution, and running both legs
# (2 warm + 2 timed heavy executions) in one block manager measured the
# buildup (evicted blocks/GC), not the leg — a compute-only pass timed
# AFTER the e2e pair came out slower than the full e2e at the same cores.
rec = {"cores": cores, "docs": n_docs}
if mode in ("both", "e2e"):
    run_dataprep(spark, docs, os.path.join(out, f"warm_{cores}"), n_buckets=8)
    t0 = time.time()
    counters = run_dataprep(spark, docs, os.path.join(out, f"run_{cores}"), n_buckets=8)
    dt = time.time() - t0
    rec.update({"elapsed_s": dt, "docs_per_sec": n_docs / dt,
                "counters": counters})
if mode in ("both", "compute"):
    # compute-only: full verdict table, noop sink — isolates
    # compute+shuffle from the single-local-disk write
    curate_documents(docs).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    curate_documents(docs).write.format("noop").mode("overwrite").save()
    dt_c = time.time() - t0
    rec.update({"compute_elapsed_s": dt_c,
                "compute_docs_per_sec": n_docs / dt_c})
print(json.dumps(rec))
spark.stop()
"""


def run(
    cores: int, sf_dir: str, out: str, attempts: int = 2, mode: str = "both"
) -> dict:
    env = dict(os.environ)
    timeout_s = int(os.environ.get("SCALING_TIMEOUT_S", "1800"))
    last_err = ""
    for attempt in range(attempts):
        try:
            res = subprocess.run(
                [sys.executable, "-c", WORKER, str(cores), sf_dir, out, mode],
                capture_output=True, text=True, env=env, timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            last_err = f"worker local[{cores}] hung > {timeout_s}s (attempt {attempt + 1})"
            print(last_err, file=sys.stderr)
            continue
        if res.returncode == 0:
            line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
            return json.loads(line)
        last_err = res.stderr[-4000:]
        print(last_err, file=sys.stderr)
    raise SystemExit(f"worker local[{cores}] failed: {last_err[-500:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "4"))
    # ALTERNATED best-of-R protocol (default 3): the shared box's
    # throughput ceiling fluctuates 2-4x across minutes (documented since
    # round 3 — single runs measured e2e-16c anywhere between 47 and
    # 159 s on IDENTICAL code the same hour). Interference is strictly
    # ADDITIVE time, so the BEST rate per parallelism is the least-biased
    # estimate of the leg's true capability; legs alternate N/4N so both
    # sample the same box regimes, and every rate is reported.
    reps = int(os.environ.get("SCALING_REPS", "3"))
    lo_rates: list[float] = []
    hi_rates: list[float] = []
    with tempfile.TemporaryDirectory() as tmp:
        lo = hi = None
        for _ in range(reps):
            r_lo = run(n, sf_dir, tmp, mode="e2e")
            r_hi = run(4 * n, sf_dir, tmp, mode="e2e")
            lo_rates.append(r_lo["docs_per_sec"])
            hi_rates.append(r_hi["docs_per_sec"])
            if lo is None or r_lo["docs_per_sec"] > lo["docs_per_sec"]:
                lo = r_lo
            if hi is None or r_hi["docs_per_sec"] > hi["docs_per_sec"]:
                hi = r_hi
        lo.update(run(n, sf_dir, tmp, mode="compute"))
        hi.update(run(4 * n, sf_dir, tmp, mode="compute"))
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    ceff = (hi["compute_docs_per_sec"] / lo["compute_docs_per_sec"]) / 4.0
    result = {
        "metric": "dataprep_scaling_efficiency",
        "value": round(eff, 3),
        "compute_value": round(ceff, 3),
        "unit": "ratio",
        "protocol": f"alternated best-of-{reps} e2e legs (additive-noise box)",
        "n_cores": n,
        "n4_cores": 4 * n,
        "docs": lo["docs"],
        "docs_per_sec_n": round(lo["docs_per_sec"], 1),
        "docs_per_sec_4n": round(hi["docs_per_sec"], 1),
        "rates_n_all": [round(r, 1) for r in lo_rates],
        "rates_4n_all": [round(r, 1) for r in hi_rates],
        "compute_docs_per_sec_n": round(lo["compute_docs_per_sec"], 1),
        "compute_docs_per_sec_4n": round(hi["compute_docs_per_sec"], 1),
        "elapsed_n_s": round(lo["elapsed_s"], 2),
        "elapsed_4n_s": round(hi["elapsed_s"], 2),
        "counters_n": lo["counters"],
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_dataprep.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
