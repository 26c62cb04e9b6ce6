"""Compound synthetic-record fold (J9/X4, predict_multiple analog):
grouped kernel == declarative plan == pure-Python golden."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mehari_spark.datagen import (
    fixture_patterns,
    reference_compounds,
    reference_triples,
    synth_transcripts,
    turns_df,
)
from mehari_spark.operators.compound import (
    COMPOUND_PRED_ID,
    compound_triples,
    compound_triples_sql,
    with_compounds,
)
from mehari_spark.operators.triples import extract_triples_fused

_COLS = (
    "conv_id subj_id pred_id n_parts min_obj max_obj first_turn last_turn min_pred"
).split()


def _rowset(df):
    return {tuple(getattr(r, c) for c in _COLS) for r in df.collect()}


@pytest.fixture(scope="module")
def turns():
    return synth_transcripts(seed=99, n_convs=15, turns_per_conv=8, hot_convs=1)


@pytest.fixture(scope="module")
def triples_df(spark, turns):
    return extract_triples_fused(turns_df(spark, turns), fixture_patterns()).select(
        "conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"
    )


class TestCompoundFold:
    def test_kernel_equals_declarative(self, spark, triples_df):
        a = _rowset(compound_triples(triples_df))
        b = _rowset(compound_triples_sql(triples_df))
        assert a, "no compound groups in fixture — generator too sparse"
        assert a == b

    def test_kernel_equals_golden(self, spark, turns, triples_df):
        golden = reference_compounds(reference_triples(turns, fixture_patterns()))
        got = _rowset(compound_triples(triples_df))
        assert got == golden

    def test_min_parts_threshold(self, spark, triples_df):
        # every emitted group must actually hold >= 3 distinct parts
        out = compound_triples(triples_df, min_parts=3)
        assert out.filter(F.col("n_parts") < 3).count() == 0
        # and min_parts=3 output is a subset of min_parts=2 groups
        k3 = {(r.conv_id, r.subj_id) for r in out.collect()}
        k2 = {
            (r.conv_id, r.subj_id)
            for r in compound_triples(triples_df, min_parts=2).collect()
        }
        assert k3 <= k2

    def test_with_compounds_emission_contract(self, spark, triples_df):
        merged = with_compounds(triples_df)
        n_orig = triples_df.count()
        n_synth = compound_triples(triples_df).count()
        assert merged.count() == n_orig + n_synth
        synth = merged.filter(F.col("is_synthetic"))
        assert synth.count() == n_synth
        assert synth.filter(F.col("pred_id") != COMPOUND_PRED_ID).count() == 0
