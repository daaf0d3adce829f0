"""Scalar-function surface (SURVEY §2.9) with DuckDB-parity helpers.

Every helper has an exact DuckDB-SQL counterpart documented inline; the
registry's oracle strings use those counterparts so the driver's value
hash matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact-decimal accumulator type for money math — mirrors the reference's
#: BigDecimal sums (gmall ProductStatsApp.java:219-227, bean/OrderInfo.java:13-17).
MONEY = "decimal(18,2)"


def dec_sum(col: str | Column, alias: str) -> Column:
    """Order-independent money sum: SUM(CAST(x AS DECIMAL(18,2)))::DOUBLE.

    DuckDB oracle: ``CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
    Decimal addition is exact, so partial/final aggregation order (and
    Spark-vs-DuckDB evaluation order) cannot perturb the result; the final
    double cast is the same correctly-rounded conversion in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double").alias(alias)


def half_up_x100(num_sql: str, den_sql: str, divop: str = "DIV") -> str:
    """SQL fragment: HALF_UP ratio at 2dp via pure integer arithmetic.

    Reproduces the reference's ``BigDecimal.setScale(2, HALF_UP)`` ratios
    (gmall-publisher bean/VisitorStats.java:33-62) without float rounding:
    ``round_half_up(100*num/den) == (200*num + den) intdiv (2*den)`` for
    non-negative integers — exact in both engines, so no double-rounding
    divergence. ``divop`` is ``DIV`` for Spark SQL, ``//`` for DuckDB.
    Denominator 0 guards to 0 like the reference.
    """
    return (
        f"CASE WHEN ({den_sql}) = 0 THEN CAST(0 AS DOUBLE) "
        f"ELSE CAST((200 * ({num_sql}) + ({den_sql})) {divop} (2 * ({den_sql})) AS DOUBLE) / 100.0 END"
    )
