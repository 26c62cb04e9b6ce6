"""Driver-facing query registry: Spark implementation + DuckDB oracle SQL.

Every SQL-expressible operator ships BOTH a Spark DataFrame implementation
(the engine) and an independent ANSI-SQL oracle the driver runs on DuckDB —
mehari's verify-against-VEP discipline (verify/seqvars.rs:96-364) applied to
every operator. Column names/aliases are identical on both sides; outputs
avoid raw floats/timestamps (epoch bigints, rounded cents) so value hashes
are stable across engines.

Registry shape: ``QUERIES[name] = (spark_fn, oracle_sql | None)``; a None
oracle means the op is not SQL-expressible (iterative CC, LSH with Python
hashing, stubs) and the driver records a rows-only check.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..dictionary import (
    demo_patterns,
    entity_values_sql,
    predicate_values_sql,
)
from ..operators.mentions import detect_mentions
from ..operators.triples import assemble_triples
from ..operators.coref import coref_clusters
from ..sources.transcripts import TRANSCRIPTS_ORACLE_CTE, transcripts

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------------
# shared oracle CTE fragments
# --------------------------------------------------------------------------

_TOKENS_CTE = f"""
{TRANSCRIPTS_ORACLE_CTE.strip()},
tokens AS (
  SELECT conv_id, turn_idx, CAST(i AS INTEGER) AS pos, w2[i+1] AS tok
  FROM (SELECT conv_id, turn_idx, string_split(text,' ') AS w2 FROM turns),
       unnest(generate_series(0, len(w2)-1)) AS g(i)
),
ent AS (SELECT * FROM {entity_values_sql()}),
prd AS (SELECT * FROM {predicate_values_sql()}),
em AS (SELECT t.conv_id, t.turn_idx, t.pos, e.entity_id FROM tokens t JOIN ent e ON t.tok = e.alias),
pm AS (SELECT t.conv_id, t.turn_idx, t.pos, p.canon_id, p.rank FROM tokens t JOIN prd p ON t.tok = p.surface)
"""

_TRIPLES_CTE = f"""
{_TOKENS_CTE},
seq AS (
  SELECT conv_id, turn_idx, pos, entity_id, CAST(NULL AS BIGINT) AS canon_id, CAST(NULL AS INTEGER) AS rank FROM em
  UNION ALL
  SELECT conv_id, turn_idx, pos, CAST(NULL AS BIGINT), canon_id, rank FROM pm
),
wnd AS (
  SELECT *,
    LAST_VALUE(entity_id IGNORE NULLS) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS subj_id,
    FIRST_VALUE(entity_id IGNORE NULLS) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS obj_id
  FROM seq
),
cand AS (
  SELECT conv_id, turn_idx, subj_id, canon_id AS pred_id, obj_id, rank, pos,
    ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, subj_id, obj_id ORDER BY rank, canon_id, pos) AS rn
  FROM wnd WHERE canon_id IS NOT NULL AND subj_id IS NOT NULL AND obj_id IS NOT NULL
),
triples AS (
  SELECT conv_id, turn_idx, subj_id, pred_id, obj_id FROM cand WHERE rn = 1
)
"""


# --------------------------------------------------------------------------
# KG pipeline queries (the flagship path)
# --------------------------------------------------------------------------


@register(
    "kg_transcripts",
    f"""WITH {TRANSCRIPTS_ORACLE_CTE.strip()}
SELECT conv_id, turn_idx, role, text, tool, epoch(ts)::BIGINT AS ts_epoch
FROM turns""",
)
def kg_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S6 scan analog: the derived transcripts input table."""
    return transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


@register(
    "kg_entity_mentions",
    f"""WITH {_TOKENS_CTE}
SELECT conv_id, turn_idx, entity_id, COUNT(*)::BIGINT AS n_mentions
FROM em GROUP BY conv_id, turn_idx, entity_id""",
)
def kg_entity_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 analog: Aho-Corasick entity mention detection (mapInPandas)."""
    m = detect_mentions(transcripts(spark, sf_dir), demo_patterns())
    return (
        m.filter(F.col("kind") == "E")
        .groupBy("conv_id", "turn_idx", F.col("ref_id").alias("entity_id"))
        .agg(F.count("*").alias("n_mentions"))
    )


@register(
    "kg_predicate_mentions",
    f"""WITH {_TOKENS_CTE}
SELECT conv_id, turn_idx, canon_id AS pred_id, COUNT(*)::BIGINT AS n_mentions
FROM pm GROUP BY conv_id, turn_idx, canon_id""",
)
def kg_predicate_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/SO-canonicalization analog: predicate mentions, umbrella-rewritten."""
    m = detect_mentions(transcripts(spark, sf_dir), demo_patterns())
    return (
        m.filter(F.col("kind") == "P")
        .groupBy("conv_id", "turn_idx", F.col("canon_id").alias("pred_id"))
        .agg(F.count("*").alias("n_mentions"))
    )


@register(
    "kg_triples",
    f"""WITH {_TRIPLES_CTE}
SELECT conv_id, turn_idx, subj_id, pred_id, obj_id FROM triples""",
)
def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: mention scan -> windowed triple assembly -> best-per-group dedup."""
    m = detect_mentions(transcripts(spark, sf_dir), demo_patterns())
    return assemble_triples(m).select(
        "conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"
    )


@register(
    "kg_coref_clusters",
    f"""WITH RECURSIVE {_TRIPLES_CTE},
edges AS (
  SELECT DISTINCT conv_id, LEAST(subj_id, obj_id) AS src, GREATEST(subj_id, obj_id) AS dst
  FROM triples WHERE subj_id <> obj_id
),
bidir AS (
  SELECT conv_id, src, dst FROM edges UNION SELECT conv_id, dst, src FROM edges
),
nodes AS (SELECT DISTINCT conv_id, src AS node FROM bidir),
reach AS (
  SELECT conv_id, node, node AS root FROM nodes
  UNION
  SELECT b.conv_id, b.dst AS node, r.root
  FROM reach r JOIN bidir b ON b.conv_id = r.conv_id AND b.src = r.node
)
SELECT conv_id, node AS entity_id, MIN(root)::BIGINT AS cluster_id
FROM reach GROUP BY conv_id, node""",
)
def kg_coref_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 analog: per-conversation coreference connected components."""
    m = detect_mentions(transcripts(spark, sf_dir), demo_patterns())
    return coref_clusters(assemble_triples(m))


@register(
    "kg_triples_by_predicate",
    f"""WITH {_TRIPLES_CTE}
SELECT pred_id, COUNT(*)::BIGINT AS n_triples,
       COUNT(DISTINCT conv_id)::BIGINT AS n_convs,
       MIN(subj_id)::BIGINT AS min_subj, MAX(obj_id)::BIGINT AS max_obj
FROM triples GROUP BY pred_id""",
)
def kg_triples_by_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A6 analog: KG rollup statistics per canonical predicate."""
    m = detect_mentions(transcripts(spark, sf_dir), demo_patterns())
    t = assemble_triples(m)
    return t.groupBy("pred_id").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("subj_id").alias("min_subj"),
        F.max("obj_id").alias("max_obj"),
    )
