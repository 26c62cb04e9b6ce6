"""Session-scoped shared-stage cache: materialize an expensive intermediate
DataFrame once, reuse it across queries in the same SparkSession.

The production analog at 100 TB is a MATERIALIZED TABLE: a signature/pairs
stage written once (e.g. the MinHash band table) and read by every consumer
(pair mining, clustering, reporting) instead of each recomputing it from the
raw corpus. Within one interactive session, ``persist()`` + a keyed registry
is the same discipline without the write: the first consumer pays the
computation, later consumers start from the cached blocks.

Honesty contract for benchmarks: reuse WITHIN one logical pipeline run is
real stage sharing and is fair to measure; reuse ACROSS repetitions of the
same run would measure the cache, not the code — bench.py calls
``clear_shared_stages()`` between repetitions so every rep is cold.

Keys include the SparkContext applicationId: a cached DataFrame from a
stopped session is unusable, so entries from other app ids are evicted on
first access from a new session.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}
_MAX_ENTRIES = 4
_DISABLED = False


@contextlib.contextmanager
def cache_disabled() -> Iterator[None]:
    """Bypass the stage cache entirely: ``shared_stage`` builds inline,
    persisting nothing. Used by cold-plan metrics capture (bench.py
    --explain): a query whose shared stage is already persisted would
    otherwise report the InMemoryTableScan's 0 exchanges instead of the
    real cold exchange structure."""
    global _DISABLED
    prev = _DISABLED
    _DISABLED = True
    try:
        yield
    finally:
        _DISABLED = prev


def _unpersist_quiet(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass  # session already stopped: nothing to release


def shared_stage(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the cached DataFrame for ``key`` or build + persist it.

    ``key`` identifies the stage CONTENT (stage name, input path, params) —
    the caller must include everything that changes the result."""
    if _DISABLED:
        return build()
    app_id = spark.sparkContext.applicationId
    full_key = (app_id, *key)
    df = _CACHE.get(full_key)
    if df is None:
        # drop stale entries from previous sessions first
        for k in [k for k in _CACHE if k[0] != app_id]:
            _unpersist_quiet(_CACHE.pop(k))
        while len(_CACHE) >= _MAX_ENTRIES:  # bounded: evict oldest
            _unpersist_quiet(_CACHE.pop(next(iter(_CACHE))))
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        _CACHE[full_key] = df
    return df


def materialize_once(
    spark: SparkSession, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Compute-once materialization for a stage consumed by multiple plan
    branches (e.g. both sides of a band self-join), WITHOUT leaking blocks.

    Normal path: routes through the bounded ``shared_stage`` LRU — the
    persisted blocks are evicted (unpersisted) once 4 newer stages exist
    and on session change, so repeated query builds in a long-lived
    session (bench reps, session-scoped pytest) never accrete
    block-manager storage the way per-invocation ``localCheckpoint``
    blocks did. Because ``persist`` keeps lineage, an evicted stage a
    caller still references simply recomputes instead of failing.

    Under ``cache_disabled()`` (cold-plan metrics capture): falls back to
    a lazy ``localCheckpoint`` so captured plans keep the same
    materialize-once shape they are benchmarked with, rather than
    silently showing a double-compute the cached path never executes."""
    if _DISABLED:
        return build().localCheckpoint(eager=False)
    return shared_stage(spark, key, build)


def clear_shared_stages() -> None:
    """Unpersist and forget every cached stage (bench calls this between
    repetitions so measurements stay cold)."""
    for k in list(_CACHE):
        _unpersist_quiet(_CACHE.pop(k))
