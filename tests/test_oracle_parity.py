"""Run every registered query against its DuckDB oracle at sf0.001 —
the same comparison the driver does at sf0.01 (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from mehari_spark.plans import queries as Q

from .conftest import SF_UNIT
from .helpers import assert_frames_match

CASES = sorted(Q.QUERIES.keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, duck, name):
    fn, oracle = Q.QUERIES[name]
    sdf = fn(spark, SF_UNIT)
    spdf = sdf.toPandas()
    assert spdf is not None
    if oracle is None:
        assert len(spdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    opdf = duck.execute(oracle).fetchdf()
    assert_frames_match(spdf, opdf, name)
