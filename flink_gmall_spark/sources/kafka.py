"""Kafka source/sink wiring — the production I/O layer (SURVEY §2.1 S1-S4).

The reference's topology is Kafka between every warehouse layer
(MyKafkaUtil.java:27-61). Spark-native equivalents:

- S1 string source  → ``readStream.format("kafka")`` + value cast.
- S2 string sink    → ``writeStream.format("kafka")`` with a fixed topic.
- S3 dynamic per-record topic (BaseDBApp routes each CDC record to its
  ``sink_table`` topic with an exactly-once producer) → Spark's Kafka sink
  routes per-row whenever a ``topic`` *column* exists; exactly-once =
  checkpointed offsets + idempotent/transactional downstream.
- S4 SQL connector DDL → reader options (startingOffsets) + ``from_json``.

This container has no Kafka broker or spark-sql-kafka jar, so these
builders raise a clear error at call time if the integration is absent;
the file/Delta path in ``sources.tables`` + ``streaming.jobs`` is the
tested mirror of the same topology (SURVEY §3.3: inter-job Kafka hops
become materialized tables in test mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BOOTSTRAP = "localhost:9092"


def _require_kafka(spark: SparkSession) -> None:
    """Probe the JVM classpath for the Kafka data source, however it was
    supplied (spark.jars.packages, --jars, spark.jars, or a bundled
    distribution) — string-matching one conf key would wrongly reject
    legitimate setups. Resolution goes through Spark's own loader
    (Utils.classForName → MutableURLClassLoader): jars added via --jars /
    spark.jars live there, NOT on py4j's system classloader, so a plain
    java.lang.Class.forName would falsely reject exactly those setups."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider", True, False
        )
    except Exception:
        raise RuntimeError(
            "Kafka integration needs the spark-sql-kafka-0-10 package on the "
            "classpath (e.g. spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> or "
            "--jars); use the file-source mode (sources.tables / "
            "streaming.jobs) in environments without a broker."
        ) from None


def read_stream(
    spark: SparkSession,
    topic: str,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S4: subscribe and expose the value as a string column (the shape
    every DWD job parses with from_json)."""
    _require_kafka(spark)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def write_stream(
    df: DataFrame,
    checkpoint: str,
    topic: str | None = None,
    bootstrap: str = DEFAULT_BOOTSTRAP,
):
    """S2/S3: Kafka sink. With ``topic=None`` the DataFrame must carry a
    ``topic`` column and each row routes to its own topic — the Spark
    idiom for the reference's per-record sink_table routing
    (MyKafkaUtil.java:44-50). The checkpoint gives effectively-once
    delivery (offsets + idempotent replay)."""
    _require_kafka(df.sparkSession)
    if topic is None and "topic" not in df.columns:
        raise ValueError("either pass topic= or provide a 'topic' column")
    out = df.select(
        *(["topic"] if topic is None else []),
        F.col("value").cast("string").alias("value"),
    )
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer.start()
