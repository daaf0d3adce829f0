"""Accuracy contract for the approximate aggregates (no SQL oracle —
sketch implementations are engine-specific by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_gmall_spark.plans import ads
from flink_gmall_spark.sources import load


def test_approx_within_tolerance(spark, sf_dir):
    got = {r["event_type"]: r for r in ads.approx_stats(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
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
