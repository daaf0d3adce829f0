"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``flink_gmall_spark`` (see SURVEY.md §2 for the
operator inventory each query covers); this module is a thin re-export of
``flink_gmall_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_gmall_spark import registry as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    dws_product_stats exercises scan → decimal-exact aggregation with
    distinct-via-set → broadcast dim join (SURVEY §2.5 A2 + §2.4 J3).
    """
    return _registry.registry()["dws_product_stats"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each queries() key (keys without an
    entry are non-SQL-expressible and get the driver's rows-only check)."""
    return _registry.oracle_sql()
