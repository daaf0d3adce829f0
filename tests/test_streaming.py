"""Streaming-vs-batch parity: the incremental engine must produce the
same results as the batch plans (which are themselves oracle-checked)."""

from __future__ import annotations

import pandas as pd

from flink_gmall_spark.plans import dwm, dws
from flink_gmall_spark.streaming import jobs, state
from tests.oracle import normalize


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    na, nb = normalize(a), normalize(b)
    return na.shape == nb.shape and bool((na.values == nb.values).all())


def test_stream_visitor_stats_matches_batch(spark, sf_dir):
    got = jobs.stream_visitor_stats(spark, sf_dir).toPandas()
    want = dws.visitor_stats(spark, sf_dir).toPandas()
    assert frames_equal(got, want)


def test_stream_visit_flag_matches_batch(spark, sf_dir):
    got = state.visit_flag_stream(spark, sf_dir).toPandas()
    want = dwm.visit_flag(spark, sf_dir).toPandas()
    assert frames_equal(got, want)


def test_stream_daily_uv_matches_batch(spark, sf_dir):
    got = state.daily_uv_stream(spark, sf_dir).toPandas()
    want = dwm.daily_uv(spark, sf_dir).toPandas()
    assert frames_equal(got, want)


def test_stream_jump_out_matches_batch_up_to_watermark(spark, sf_dir):
    """Streamed jumps must equal the batch oracle except for session
    starts still inside the watermark horizon at end-of-stream (their
    timeout never fires — Flink CEP behaves identically)."""
    got = state.jump_out_stream(spark, sf_dir).toPandas()
    want = dwm.jump_out(spark, sf_dir).toPandas()
    got_ids = set(got["event_id"])
    want_ids = set(want["event_id"])
    assert got_ids <= want_ids, f"stream emitted non-jumps: {got_ids - want_ids}"
    missing = want_ids - got_ids
    if missing:
        from flink_gmall_spark.sources import load
        from pyspark.sql import functions as F

        ev = load(spark, sf_dir, "events")
        max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
        tail = ev.filter(F.col("event_id").isin([int(i) for i in missing])).select(
            F.unix_micros("ts").alias("us")
        )
        for (us,) in tail.collect():
            assert us + dwm.JUMP_GAP_US >= max_us - 2_000_000, (
                f"non-tail jump missing from stream: us={us} max={max_us}"
            )
    # rows that did stream must carry identical payloads
    merged = got.merge(want, on="event_id", suffixes=("_s", "_b"))
    assert (merged["user_id_s"] == merged["user_id_b"]).all()
    assert (merged["ts_str_s"] == merged["ts_str_b"]).all()


def test_stream_daily_uv_tws_matches_batch(spark, sf_dir):
    """transformWithStateInPandas variant of T2 — runs only where the
    protobuf package (its state-server protocol) is installed; without
    it the entry point must fail fast with a clear message."""
    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            state.daily_uv_stream_tws(spark, sf_dir)
        return
    got = state.daily_uv_stream_tws(spark, sf_dir).toPandas()
    want = dwm.daily_uv(spark, sf_dir).toPandas()
    assert frames_equal(got, want)
