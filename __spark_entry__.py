"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query (transcripts -> Aho-Corasick
mention scan -> windowed triple assembly) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with a
DuckDB oracle where SQL-expressible (mehari's verify-vs-VEP discipline).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mehari_spark.plans.queries import QUERIES

    fn, _ = QUERIES["kg_triples"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mehari_spark.plans.queries import QUERIES

    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries get rows-only checks."""
    from mehari_spark.plans.queries import QUERIES

    return {
        name: oracle for name, (_fn, oracle) in QUERIES.items() if oracle is not None
    }
