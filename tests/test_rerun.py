"""The driver may invoke any query repeatedly in one session — results
must be stable and re-runnable (unique memory sinks, no cache poisoning,
no leaked temp views changing semantics)."""

from __future__ import annotations

import pytest

from flink_gmall_spark.registry import registry

RERUN = ["dws_province_stats", "stream_visitor_stats", "stream_t2_daily_uv", "dedup_minhash_lsh"]


@pytest.mark.parametrize("name", RERUN)
def test_rerun_is_stable(name, spark, sf_dir):
    q = registry()[name]
    first = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    second = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert first == second
