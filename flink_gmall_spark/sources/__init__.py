from flink_gmall_spark.sources.tables import TABLES, load, path, register_views  # noqa: F401
