"""Bucketed table storage for shuffle-free joins.

At 10^10 URLs the recurring joins (pages ⋈ extracted, frontier ⋈ seen)
all key on ``url_hash``. Persisting both sides bucketed by the SAME
column and count lets Spark plan SortMergeJoin with NO Exchange on
either side — the join cost collapses to a per-bucket merge.

This is the spark_catalog saveAsTable path (Hive-style bucketing); on
Iceberg the equivalent is ``bucket(N, url_hash)`` partition transforms
plus storage-partitioned joins. The test asserts the no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def save_bucketed(df: DataFrame, table: str, bucket_col: str = "url_hash",
                  n_buckets: int = DEFAULT_BUCKETS,
                  sort_col: str | None = None):
    """Persist as a bucketed managed table (overwrites)."""
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, bucket_col)
         .sortBy(sort_col or bucket_col)
         .format("parquet"))
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str = "url_hash", how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans this without an Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()
