"""Bin-bucketed range join: point-in-interval without a cartesian plan.

Mehari analog: the generic interval query (provider.rs:795-843) and the
maelstrom range aggregation (annotate/strucvars/maelstrom.rs:75-120), both
backed by the UCSC hierarchical binning scheme (binning.rs:13-26). The
Spark-first translation: store each interval at its smallest containing bin
(``hier_bin``); expand each point to its ancestor-bin chain (one bin per
level, 5 rows); equi-join on the bin key; re-check the exact range predicate.

Why this is THE 100 TB plan: a raw ``p >= start AND p < end`` join has no
equi-key, so Catalyst falls back to BroadcastNestedLoopJoin/CartesianProduct
— O(|points| x |intervals|). The bin key turns it into a hash join whose
candidate set is only the points sharing a covering bin, at the fixed cost of
a 5x fan-out on the point side (column-pruned to two ints before the
explode). Correctness: a point inside [start, end) is inside the interval's
home bin's span, so the interval's bin is always on the point's ancestor
chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import _BIN_FIRST_SHIFT, _BIN_NEXT_SHIFT, _BIN_OFFSETS, hier_bin


def point_bin_chain(p: Column) -> Column:
    """Array of the 5 ancestor bins containing point coordinate ``p`` —
    the UCSC lookup chain (binning.rs:13-26 query side)."""
    return F.array(
        *[
            F.lit(offset).cast("long")
            + F.shiftright(p.cast("long"), _BIN_FIRST_SHIFT + level * _BIN_NEXT_SHIFT)
            for level, offset in enumerate(_BIN_OFFSETS)
        ]
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= point < end, via bin-bucketed equi-join (never a cartesian).

    Both coordinate columns must be in the same (shifted) coordinate system,
    < 2^29 (the scheme's 512M span) — callers subtract a common anchor.
    """
    pts = points.withColumn("_bin", F.explode(point_bin_chain(F.col(point_col))))
    ivs = intervals.withColumn(
        "_bin", hier_bin(F.col(start_col), F.col(end_col))
    )
    joined = pts.join(ivs, "_bin", how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_bin")
