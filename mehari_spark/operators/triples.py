"""Triple assembly: (subject, predicate, object) from mention positions.

Rule (the reference semantics our goldens encode, mirroring mehari's
per-transcript consequence build, logic.rs:818-1052): for every predicate
mention p in a turn, subj = nearest entity mention strictly before p, obj =
nearest entity mention strictly after p (token positions); the triple is
emitted iff both exist. Then best-per-group dedup keeps the lowest-ranked
(most severe) predicate per (conv_id, turn_idx, subj, obj) — mehari's
worst-consequence picking (logic.rs:452-513).

Implementation is pure window functions over the mention stream: one shuffle
on (conv_id, turn_idx), reused by both windows (same partitioning), with
`last/first ignorenulls` providing the nearest-neighbor lookup — no UDF, no
self-join. At 100 TB the shuffle key is hash(conv_id, turn_idx); skew is
bounded because a turn has <= TURN_TOKENS mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def assemble_triples(mentions: DataFrame) -> DataFrame:
    """mentions (MENTIONS_SCHEMA) -> triples (conv_id, turn_idx, subj_id,
    pred_id, obj_id, pred_pos), deduped best-per-group."""
    seq = mentions.select(
        "conv_id",
        "turn_idx",
        "pos",
        F.when(F.col("kind") == "E", F.col("ref_id")).alias("entity_id"),
        F.when(F.col("kind") == "P", F.col("canon_id")).alias("p_canon"),
        F.when(F.col("kind") == "P", F.col("rank")).alias("p_rank"),
    )
    w = W.partitionBy("conv_id", "turn_idx").orderBy("pos")
    subj = F.last("entity_id", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    obj = F.first("entity_id", ignorenulls=True).over(
        w.rowsBetween(1, W.unboundedFollowing)
    )
    cand = (
        seq.withColumn("subj_id", subj)
        .withColumn("obj_id", obj)
        .filter(
            F.col("p_canon").isNotNull()
            & F.col("subj_id").isNotNull()
            & F.col("obj_id").isNotNull()
        )
    )
    dedup = W.partitionBy("conv_id", "turn_idx", "subj_id", "obj_id").orderBy(
        F.asc("p_rank"), F.asc("p_canon"), F.asc("pos")
    )
    return (
        cand.withColumn("rn", F.row_number().over(dedup))
        .filter(F.col("rn") == 1)
        .select(
            "conv_id",
            "turn_idx",
            "subj_id",
            F.col("p_canon").alias("pred_id"),
            "obj_id",
            F.col("pos").alias("pred_pos"),
        )
    )


def extract_triples_fused(
    transcripts: DataFrame,
    patterns,
    text_col: str = "text",
) -> DataFrame:
    """Fused per-turn kernel: AC scan -> overlap resolution -> nearest-rule
    assembly -> best-per-group dedup, all inside one mapInPandas pass.

    This is mehari's actual execution shape — the whole per-record kernel
    runs in-process (ConsequencePredictor::predict, logic.rs:164-278) — and
    at 100 TB it is the right plan: the triple rule is TURN-LOCAL, so
    shuffling the ~10x-larger mention stream through window exchanges buys
    nothing. The fused path emits only final triples from the scan (narrow
    map, zero shuffles); the windowed implementation (assemble_triples)
    remains as the declarative reference used by the oracle-checked queries.

    Results are identical to resolve_overlaps + assemble_triples (asserted
    in tests/test_golden_pipeline.py)."""
    import uuid

    import pandas as pd

    from ..operators.mentions import _automaton

    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast(list(patterns))
    bc_id = uuid.uuid4().hex

    def run(batches):
        ac = _automaton(bc_id, bc.value)
        for pdf in batches:
            convs, turns_, subjs, preds, objs, ppos = [], [], [], [], [], []
            for conv, turn, txt in zip(
                pdf["conv_id"].tolist(),
                pdf["turn_idx"].tolist(),
                pdf[text_col].tolist(),
            ):
                if not txt:
                    continue
                toks = txt.split(" ")
                matches = ac.scan(toks)
                if not matches:
                    continue
                # overlap resolution per kind: longest-at-pos, drop contained
                ents: list[tuple[int, int, object]] = []
                prds: list[tuple[int, object]] = []
                best_at: dict[tuple[str, int], tuple[int, int, object]] = {}
                for start, length, pat in matches:
                    key = (pat.kind, start)
                    cur = best_at.get(key)
                    if cur is None or (-length, pat.ref_id) < (-cur[1], cur[2].ref_id):
                        best_at[key] = (start, length, pat)
                prev_end = {"E": -1, "P": -1}
                for kind, start in sorted(best_at):
                    s, L, pat = best_at[(kind, start)]
                    if s + L > prev_end[kind]:
                        if kind == "E":
                            ents.append((s, L, pat))
                        else:
                            prds.append((s, pat))
                        prev_end[kind] = max(prev_end[kind], s + L)
                if not ents or not prds:
                    continue
                # nearest entity before/after each predicate
                epos = [e[0] for e in ents]
                import bisect

                cand = []
                for pi, pat in prds:
                    i = bisect.bisect_left(epos, pi)
                    if i == 0 or i == len(epos):
                        continue
                    subj = ents[i - 1][2].ref_id
                    obj = ents[i][2].ref_id
                    cand.append((subj, obj, pat.rank, pat.canon_id, pi))
                best: dict[tuple[int, int], tuple[int, int, int]] = {}
                for subj, obj, rank, canon, pi in cand:
                    cur = best.get((subj, obj))
                    if cur is None or (rank, canon, pi) < cur:
                        best[(subj, obj)] = (rank, canon, pi)
                for (subj, obj), (_r, canon, pi) in best.items():
                    convs.append(conv)
                    turns_.append(turn)
                    subjs.append(subj)
                    preds.append(canon)
                    objs.append(obj)
                    ppos.append(pi)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(convs, dtype="object"),
                    "turn_idx": pd.Series(turns_, dtype="int32"),
                    "subj_id": pd.Series(subjs, dtype="int64"),
                    "pred_id": pd.Series(preds, dtype="int64"),
                    "obj_id": pd.Series(objs, dtype="int64"),
                    "pred_pos": pd.Series(ppos, dtype="int32"),
                }
            )

    narrow = transcripts.select("conv_id", "turn_idx", text_col)
    return narrow.mapInPandas(
        run,
        schema=(
            "conv_id string, turn_idx int, subj_id long, pred_id long, "
            "obj_id long, pred_pos int"
        ),
    )
