"""Parquet table sources over the driver's synthetic star schema.

Replaces the reference's Kafka/CDC source layer (SURVEY §2.1 S1-S5) for
batch/correctness runs: ODS topics become parquet scans whose filters and
column prunes push down into the file reader. ``streaming.jobs`` layers
``readStream`` over the same files for the Structured Streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Catalyst prunes columns / pushes predicates into
    the parquet reader, so callers select/filter freely.

    ``events.ts`` is TIMESTAMP(NANOS) in the files; Spark reads it as long
    nanos (legacy.parquet.nanosAsLong, set in session.RUNTIME_CONFS) and we
    floor-convert to a micros timestamp — bit-identical to DuckDB's ns→us
    truncation.
    """
    df = spark.read.parquet(path(sf_dir, name))
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql() entry path
    (mirrors the reference's Flink SQL jobs, SURVEY §3.2)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
