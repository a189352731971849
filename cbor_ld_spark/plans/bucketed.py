"""Bucketed-table materialization: shuffle-free co-located joins.

At 10^12-file scale the expensive joins are nodes-with-edges style
graph-product joins repeated across downstream jobs.  Writing both
sides bucketed on the join key (`bucketBy` + `sortBy`, hive-style
bucket files) pays the shuffle ONCE at write time; every later join of
two tables bucketed on the same key with the same bucket count is
planned as a zero-Exchange sort-merge join — the property
tests/test_bucketed.py asserts directly on the physical plan.

Spark specifics baked in here:

* bucketed writes require ``saveAsTable`` (a metastore entry carries
  the bucket spec; plain parquet paths lose it),
* ``spark.sql.sources.bucketing.enabled`` must stay true (default) and
  the join's shuffle-partition planning must not re-shuffle — AQE
  respects bucket distribution,
* bucket count is the scale knob: at 10^12 files, O(10^4-10^5) buckets
  keeps one bucket's triples within one executor's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32,
                   sort: bool = True) -> None:
    """Materialize ``df`` as a bucketed (+sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def cogrouped_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-key same-count bucketed tables: zero shuffle.

    The merge hint keeps the planner on sort-merge so the bucket
    distribution is used; without it a small side gets broadcast (also
    shuffle-free for the big side, but it hides the co-location the
    bucketed write paid for, and at scale both sides are big).
    """
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table), key, how))


def materialize_graph_bucketed(spark: SparkSession, canon: DataFrame,
                               db: str = "kg", n_buckets: int = 32) -> None:
    """Write nodes and edges bucketed on the subject/node id so
    node<->edge joins (degree stats, neighborhood expansion, component
    rollups) never shuffle again."""
    from .pipeline import edges_table, nodes_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    write_bucketed(edges_table(canon), f"{db}.edges", "subj_canon",
                   n_buckets)
    write_bucketed(nodes_table(canon), f"{db}.nodes", "canon_iri",
                   n_buckets)
