"""Bin-bucketed range join: correctness vs naive cross-join, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from mehari_spark.operators.rangejoin import point_bin_chain, range_join_points


def _fixture(spark):
    # intervals of wildly different sizes (cross bin levels) + edge cases
    intervals = spark.createDataFrame(
        [
            (1, 100, 200),          # tiny, one fine bin
            (2, 0, 1_000_000),      # spans many fine bins -> coarse home bin
            (3, 131_000, 131_100),  # straddles a 128k bin boundary
            (4, 500, 500),          # empty interval [500, 500)
            (5, 42, 43),            # single-point interval
        ],
        "iv_id long, s long, e long",
    )
    points = spark.createDataFrame(
        [(i, p) for i, p in enumerate([0, 42, 100, 150, 199, 200, 500, 131_050,
                                       131_099, 999_999, 1_000_000, 7])],
        "pt_id long, p long",
    )
    return points, intervals


class TestRangeJoin:
    def test_matches_naive_join(self, spark):
        points, intervals = _fixture(spark)
        got = {
            (r.pt_id, r.iv_id)
            for r in range_join_points(points, intervals, "p", "s", "e").collect()
        }
        naive = {
            (r.pt_id, r.iv_id)
            for r in points.crossJoin(intervals)
            .filter((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
            .collect()
        }
        assert got == naive
        # half-open semantics: point 42 (pt_id 1) in [42,43); point 500
        # (pt_id 6) NOT in the empty interval [500,500)
        assert (1, 5) in got and (6, 4) not in got

    def test_no_duplicate_pairs(self, spark):
        points, intervals = _fixture(spark)
        out = range_join_points(points, intervals, "p", "s", "e")
        assert out.count() == out.select("pt_id", "iv_id").distinct().count()

    def test_plan_has_no_cartesian(self, spark):
        points, intervals = _fixture(spark)
        plan = (
            range_join_points(points, intervals, "p", "s", "e")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_registry_query_plan(self, spark):
        from mehari_spark.plans.queries import QUERIES

        df = QUERIES["events_range_join"][0](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_bin_chain_levels(self, spark):
        row = spark.range(1).select(
            point_bin_chain(F.lit(131_050)).alias("bins")
        ).collect()[0]
        assert len(row.bins) == 5
        assert len(set(row.bins)) == 5  # offsets separate the levels


class TestRangeJoinProperty:
    def test_random_intervals_match_naive(self, spark):
        # property-style check without per-example Spark jobs (too slow):
        # one large randomized fixture spanning all bin levels + boundaries
        import random

        rng = random.Random(123)
        ivs = []
        for i in range(200):
            start = rng.randrange(0, 2_000_000)
            length = rng.choice([0, 1, rng.randrange(1, 100),
                                 rng.randrange(1, 200_000)])
            ivs.append((i, start, start + length))
        pts = [(i, rng.randrange(0, 2_100_000)) for i in range(500)]
        # plant exact boundary points for a sample of intervals
        for j, (iid, s, e) in enumerate(ivs[:100]):
            pts.append((500 + 2 * j, s))      # inclusive start
            pts.append((501 + 2 * j, e))      # exclusive end
        points = spark.createDataFrame(pts, "pt_id long, p long")
        intervals = spark.createDataFrame(ivs, "iv_id long, s long, e long")
        got = {
            (r.pt_id, r.iv_id)
            for r in range_join_points(points, intervals, "p", "s", "e").collect()
        }
        naive = {
            (r.pt_id, r.iv_id)
            for r in points.crossJoin(intervals)
            .filter((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
            .collect()
        }
        assert got == naive
