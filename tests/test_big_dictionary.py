"""Aho-Corasick path at dictionary scale: >=10k ambiguous multi-token
patterns, fused kernel vs the independent pure-Python golden scanner."""

from __future__ import annotations

import pytest

from mehari_spark.datagen import (
    Turn,
    big_dictionary,
    reference_triples,
    turns_df,
)
from mehari_spark.operators.triples import extract_triples_fused

from datetime import datetime
import random

_VOCAB = [f"w{i}" for i in range(22)]  # 22^3 ~ 10.6k combos


@pytest.fixture(scope="module")
def big_pats():
    pats = big_dictionary(_VOCAB, 11_000)
    assert len(pats) >= 10_000
    # the dictionary must be genuinely multi-token and ambiguous (2-combos
    # are prefixes of 3-combos) so the single-token fast path can't engage
    assert any(len(p.tokens) >= 3 for p in pats)
    return pats


@pytest.fixture(scope="module")
def big_turns():
    rng = random.Random(5)
    turns = []
    for c in range(8):
        for t in range(6):
            n = rng.randint(4, 12)
            words = [rng.choice(_VOCAB) for _ in range(n)]
            # plant predicates so triples assemble
            if n >= 5:
                words[n // 2] = "uses"
            turns.append(
                Turn(f"c{c}", t, "user", " ".join(words), None, datetime(2024, 1, 1))
            )
    return turns


class TestBigDictionary:
    def test_fused_ac_matches_golden_at_10k_patterns(
        self, spark, big_pats, big_turns
    ):
        golden = reference_triples(big_turns, big_pats)
        assert golden, "no golden triples — fixture too sparse"
        fused = {
            (r.conv_id, r.turn_idx, r.subj_id, r.pred_id, r.obj_id)
            for r in extract_triples_fused(
                turns_df(spark, big_turns), big_pats
            ).collect()
        }
        assert fused == golden

    def test_dictionary_is_deterministic(self):
        a = big_dictionary(_VOCAB, 11_000)
        b = big_dictionary(_VOCAB, 11_000)
        assert a == b
