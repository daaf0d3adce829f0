"""Injectable emit-time clock (SURVEY §2.9 constants row).

The reference stamps stats rows with wall-clock time at emit
(``UNIX_TIMESTAMP()*1000 ts`` in ProvinceStatsSqlApp.java:54,
``new Date().getTime()`` in ProductStatsApp.java:245) — nondeterministic,
which is why SURVEY §5 requires a frozen/injectable clock for golden
tests. ``emit_ts()`` returns wall-clock millis by default and a pinned
value when ``FLINK_GMALL_FROZEN_CLOCK_MS`` is set; registry queries omit
the stamp entirely (the driver's hash gate demands determinism), while
production jobs append ``.withColumn("ts", emit_ts())``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

ENV_VAR = "FLINK_GMALL_FROZEN_CLOCK_MS"


def emit_ts() -> Column:
    """Emit-time epoch-millis column: frozen when the env var is set."""
    frozen = os.environ.get(ENV_VAR)
    if frozen is not None:
        return F.lit(int(frozen)).cast("long")
    return (F.unix_micros(F.current_timestamp()) / 1000).cast("long")
