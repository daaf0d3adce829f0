from flink_gmall_spark.sources.tables import (  # noqa: F401
    TABLES,
    load,
    path,
    register_views,
    spread_small_scan,
)
