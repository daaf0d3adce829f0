"""Accuracy contract for the approximate aggregates. The registry entry
is self-validating (error-bound booleans hash-pinned to TRUE by the
oracle); this file additionally checks the RAW sketch values against
exact statistics at tighter empirical tolerances."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_gmall_spark.plans import ads
from flink_gmall_spark.sources import load


def test_self_validating_booleans_all_true(spark, sf_dir):
    rows = ads.approx_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["uv_ok"] and r["p50_ok"] and r["p95_ok"], r


def test_raw_sketches_within_tolerance(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    got = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_uv"),
            F.percentile_approx("value", 0.5, 10_000).alias("p50_value"),
            F.percentile_approx("value", 0.95, 10_000).alias("p95_value"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("uv"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for etype, row in got.items():
        e = exact[etype]
        assert abs(row["approx_uv"] - e["uv"]) <= max(2, 0.05 * e["uv"])
        # with accuracy 10k >> n rows, percentile_approx is near-exact
        assert abs(row["p50_value"] - e["p50"]) <= 0.05 * max(abs(e["p50"]), 1)
        assert abs(row["p95_value"] - e["p95"]) <= 0.05 * max(abs(e["p95"]), 1)
