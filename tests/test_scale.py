"""Salted two-phase aggregation must equal the straight plan, and
append-mode streaming windows must follow watermark close semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_gmall_spark.operators import scale
from flink_gmall_spark.sources import load
from flink_gmall_spark.streaming import jobs


def test_salted_sum_count_equals_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    salted = scale.salted_sum_count(li, "l_returnflag", "l_extendedprice", "l_orderkey")
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("ct"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_count_distinct_equals_plain(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    salted = scale.salted_count_distinct(ev, "event_type", "user_id")
    plain = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("dct"))
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_append_mode_window_watermark_semantics(spark, sf_dir):
    """T5/T7: with a watermark, append mode emits only windows the final
    watermark closed; the last window stays open and is withheld — the
    same drop/emit discipline as the reference's event-time pipeline."""
    ev = jobs.read_stream(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "1 second")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("ct"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("dt"), "ct")
    )
    got = jobs.run_to_memory(agg, "append").toPandas()

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("dt"))
        .agg(F.count(F.lit(1)).alias("ct"))
        .toPandas()
    )
    last_day = batch["dt"].max()
    closed = batch[batch["dt"] < last_day]
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(
        map(tuple, closed.itertuples(index=False))
    )


def test_shingle_freq_strategies_agree(spark, sf_dir):
    """The skew-safe anti-join DF-cap (100 TB path) must produce the same
    shingle set as the default windowed count (min-stage path)."""
    from flink_gmall_spark.operators import dedup

    docs = load(spark, sf_dir, "documents")
    win = dedup._shingles(docs, strategy="window")
    anti = dedup._shingles(docs, strategy="antijoin")
    assert sorted(map(tuple, win.collect())) == sorted(map(tuple, anti.collect()))
