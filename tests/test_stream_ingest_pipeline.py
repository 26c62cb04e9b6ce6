"""Composed streaming ingest pipeline (quality -> exact dedup -> near-dup):
per-stage verdict attribution, kept-set agreement with the batch curation
pipeline, and exactly-once verdicts across a restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.streaming.ingest_pipeline import (
    DOCS_DDL,
    process_all,
    read_pipeline_verdicts,
    stream_ingest_pipeline,
)
from mehari_spark.streaming.replay import write_arrival_chunk

from .conftest import SF_UNIT


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def _dirs(tmp_path):
    return str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")


class TestComposedPipeline:
    def test_stage_attribution(self, spark, tmp_path):
        """Each drop lands on its stage: quality / exact_dup / near_dup;
        survivors are 'kept'."""
        base = " ".join(f"tok{i}" for i in range(40)) + " the and is"
        other = " ".join(f"z{i}" for i in range(40)) + " the and is"
        rows = [
            (1, "en", base),                 # kept
            (2, "en", base),                 # exact dup of 1
            (3, "en", base + " x1"),         # near-dup of 1 (J ~ 0.977)
            (4, "en", "too short"),          # quality (bit 1, no stopword)
            (5, "en", other),                # kept (novel)
        ]
        in_dir, out_dir, ck = _dirs(tmp_path)
        _docs(spark, rows).write.mode("append").parquet(in_dir)
        q1, q2 = stream_ingest_pipeline(
            spark, in_dir, out_dir, ck, threshold=0.95
        )
        process_all(q1, q2)
        q1.stop(); q2.stop()
        got = {
            r.doc_id: (r.verdict, r.dup_of)
            for r in read_pipeline_verdicts(spark, out_dir).collect()
        }
        assert got == {
            1: ("kept", None),
            2: ("exact_dup", 1),
            3: ("near_dup", 1),
            4: ("quality", None),
            5: ("kept", None),
        }

    def test_verdicts_agree_with_batch_stage_twins(self, spark, tmp_path):
        """Composed-stream verdicts on the demo corpus (fed in doc_id
        order) against the BATCH twins of each stage:

        - quality drops == the batch quality_filter fail set (shared
          definition);
        - exact_dup drops == non-first members of batch md5 groups among
          quality-passing docs;
        - the kept set is NEAR-DUP-FREE (no batch LSH pair >= threshold
          has both endpoints kept) and every near_dup drop points at an
          earlier doc it exceeds the threshold against.

        NOTE the kept set is deliberately NOT compared to batch
        ``curate_documents``: CC-representative dedup drops every
        non-representative member of a transitive COMPONENT (members may
        be far below the threshold from the rep), while ingest keep-first
        keeps a maximal greedy near-dup-free set — both standard, and the
        greedy one is what continuous ingest means (a doc admitted when
        nothing similar was seen is never revoked)."""
        from mehari_spark.operators.dedup import (
            exact_dedup_groups,
            minhash_lsh_pairs,
        )
        from mehari_spark.operators.textstats import quality_filter

        docs = (
            spark.read.parquet(f"{SF_UNIT}/documents.parquet")
            .select("doc_id", "lang", "text")
            .limit(300)
        )
        in_dir, out_dir, ck = _dirs(tmp_path)
        docs.filter(F.col("doc_id") < 150).write.mode("append").parquet(in_dir)
        q1, q2 = stream_ingest_pipeline(
            spark, in_dir, out_dir, ck, threshold=0.95
        )
        process_all(q1, q2)
        docs.filter(F.col("doc_id") >= 150).write.mode("append").parquet(in_dir)
        process_all(q1, q2)
        q1.stop(); q2.stop()

        verdicts = read_pipeline_verdicts(spark, out_dir)
        assert verdicts.count() == docs.count()  # every doc, exactly once
        by = {
            r.doc_id: (r.verdict, r.dup_of) for r in verdicts.collect()
        }
        # stage twins
        q_fail = {
            r.doc_id
            for r in quality_filter(docs).filter("filter_reasons != 0").collect()
        }
        passing = docs.join(
            spark.createDataFrame([(i,) for i in q_fail] or [(-1,)], "doc_id long"),
            "doc_id",
            "left_anti",
        )
        exact_first = {
            r.min_doc_id for r in exact_dedup_groups(passing).collect()
        }
        exact_dups = {
            d for d in by if by[d][0] == "exact_dup"
        }
        assert {d for d, v in by.items() if v[0] == "quality"} == q_fail
        assert exact_dups == {
            r.doc_id for r in passing.collect()
        } - exact_first
        # near-dup-free kept set + drops point at earlier above-threshold docs
        kept = {d for d, v in by.items() if v[0] == "kept"}
        pairs = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(docs, threshold=0.95).collect()
        }
        assert not [p for p in pairs if p[0] in kept and p[1] in kept]
        for d, (v, dup) in by.items():
            if v == "near_dup":
                assert dup < d  # keep-first == keep-lowest under monotone feed
                assert (dup, d) in pairs, (d, dup)

    def test_restart_is_exactly_once(self, spark, tmp_path):
        """Stop both stages mid-corpus, restart with the same dirs: every
        document still gets exactly one verdict, and post-restart dups of
        pre-restart docs are caught by the restored state."""
        base = " ".join(f"w{i}" for i in range(40)) + " the and is"
        novel = " ".join(f"q{i}" for i in range(40)) + " the and is"
        in_dir, out_dir, ck = _dirs(tmp_path)
        write_arrival_chunk(
            _docs(spark, [(1, "en", base), (2, "en", base)]), in_dir
        )
        q1, q2 = stream_ingest_pipeline(
            spark, in_dir, out_dir, ck, threshold=0.95
        )
        process_all(q1, q2)
        q1.stop(); q2.stop()
        # post-restart wave: exact dup of 1, near-dup of 1, novel doc
        write_arrival_chunk(
            _docs(
                spark,
                [(3, "en", base), (4, "en", base + " x1"), (5, "en", novel)],
            ),
            in_dir,
        )
        q1, q2 = stream_ingest_pipeline(
            spark, in_dir, out_dir, ck, threshold=0.95
        )
        process_all(q1, q2)
        q1.stop(); q2.stop()
        got = {
            r.doc_id: (r.verdict, r.dup_of)
            for r in read_pipeline_verdicts(spark, out_dir).collect()
        }
        assert got == {
            1: ("kept", None),
            2: ("exact_dup", 1),
            3: ("exact_dup", 1),
            4: ("near_dup", 1),
            5: ("kept", None),
        }
