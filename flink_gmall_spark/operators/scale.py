"""Skew-mitigation utilities for hot-key aggregations and joins.

AQE's skew-join splitting (enabled in session.RUNTIME_CONFS) covers most
runtime skew; these helpers cover the cases AQE cannot re-plan — a single
pathological group key in an aggregation, and distinct-heavy rollups —
using the classic two-phase salted shape: aggregate on (key, salt) first
so the hot key fans out over SALT_BUCKETS reducers, then combine partials.
Results are identical to the unsalted plan (sums/counts are associative;
distinct pre-dedups on the salted key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def _salt(cols: list[str]) -> Column:
    """Deterministic salt from row content (stable across retries —
    rand()-based salts break exactly-once replay)."""
    return F.pmod(F.xxhash64(*cols), F.lit(SALT_BUCKETS))


def salted_sum_count(
    df: DataFrame, key: str, value: str, salt_from: str
) -> DataFrame:
    """Two-phase salted sum+count keyed on ``key``: phase 1 aggregates on
    (key, salt(salt_from)), phase 2 combines. Output: key, total, ct."""
    phase1 = (
        df.withColumn("__salt", _salt([salt_from]))
        .groupBy(key, "__salt")
        .agg(
            F.sum(F.col(value).cast("decimal(18,2)")).alias("p_sum"),
            F.count(F.lit(1)).alias("p_ct"),
        )
    )
    return phase1.groupBy(key).agg(
        F.sum("p_sum").cast("double").alias("total"),
        F.sum("p_ct").cast("long").alias("ct"),
    )


def salted_count_distinct(df: DataFrame, key: str, distinct_col: str) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per key for skewed keys: salt by
    the *distinct* column so each hot key's dedup spreads over reducers;
    phase 1 dedups (key, salt, value), phase 2 counts. Output: key, dct."""
    phase1 = (
        df.withColumn("__salt", _salt([distinct_col]))
        .select(key, "__salt", distinct_col)
        .dropDuplicates([key, "__salt", distinct_col])
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("p_dct"))
    )
    return phase1.groupBy(key).agg(F.sum("p_dct").cast("long").alias("dct"))


def salted_status_rollup(spark, sf_dir: str) -> DataFrame:
    """Registry face of the salted two-phase aggregation: order totals per
    status (3 wildly skewed groups — exactly the single-hot-key shape AQE
    cannot re-plan, since skew-join splitting does not apply to
    aggregations). Phase 1 fans each status over SALT_BUCKETS reducers on
    a content-derived salt; phase 2 combines partials. The oracle is the
    straight GROUP BY — salting must be invisible in the result."""
    from flink_gmall_spark.session import tune
    from flink_gmall_spark.sources import load

    tune(spark)
    orders = load(spark, sf_dir, "orders")
    out = salted_sum_count(orders, "o_orderstatus", "o_totalprice", "o_orderkey")
    return out.select("o_orderstatus", "total", "ct")


ORACLE_SALTED_STATUS_ROLLUP = """
SELECT o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(count(*) AS BIGINT) AS ct
FROM orders
GROUP BY o_orderstatus
"""
