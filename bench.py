#!/usr/bin/env python
"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (count() would let
Catalyst prune the compute). Methodology: each query runs once COLD
(pays one-time Catalyst analysis + whole-stage-codegen compile + JVM JIT,
measured 1.5-5 s per novel plan shape on this container, independent of
data size — reported in `queries_cold`) and then WARM_RUNS times warm.
`queries`/`value` keep the first-warm-run convention of rounds 1-5 for
cross-round comparability; `queries_median`/`value_median` carry the
per-query MEDIAN of the warm runs and are the numbers round-over-round
comparison should use. Rationale: single-shot warm timings on this
container carry up to ±50 % noise on sub-second queries — three rounds
running (r4: simhash; r5: cdc_upsert, text_quality) produced phantom
>20 % regressions that each cost a manual looped re-measurement session;
the median is that looped protocol, in the harness (VERDICT r5 ask #4).
The engine this emulates is a long-running streaming warehouse where
plans compile once and run for days, so warm is the apples-to-apples
throughput comparison — but the cold column keeps plan-compile
regressions (which a scheduled batch job does pay) visible.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_gmall_spark.registry import registry
from flink_gmall_spark.session import get_spark

WARM_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_WARM_RUNS", "5"))


def _host_snapshot() -> dict:
    """One compact sample of host load state (VERDICT r8 ask #3).

    The r8 round saw a uniform +14 % wall-time shift across 26/27
    unrelated queries that the same-tree local bench did not reproduce —
    classic bench-host contention, but undecidable from the JSON alone.
    This fingerprint makes it decidable: loadavg is HOST-wide (not
    cgroup-scoped), so a loadavg far above this process's own thread
    count means a noisy neighbour; /proc/stat steal/iowait jiffies name
    the mechanism; MemAvailable/Cached catch page-cache eviction (cold
    parquet reads). Collection is best-effort — a missing /proc never
    fails the bench.
    """
    snap: dict = {}
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        snap["load1"], snap["load5"], snap["load15"] = (
            float(parts[0]), float(parts[1]), float(parts[2]))
    except Exception:
        pass
    try:
        with open("/proc/stat") as f:
            cpu = f.readline().split()
        # user nice system idle iowait irq softirq steal
        vals = [int(v) for v in cpu[1:9]]
        snap["jiffies"] = {
            "total": sum(vals), "idle": vals[3], "iowait": vals[4],
            "steal": vals[7] if len(vals) > 7 else 0,
        }
    except Exception:
        pass
    try:
        mem = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, _, v = line.partition(":")
                if k in ("MemAvailable", "Cached"):
                    mem[k] = int(v.split()[0])
        snap["mem_avail_gb"] = round(mem.get("MemAvailable", 0) / 1048576, 2)
        snap["cached_gb"] = round(mem.get("Cached", 0) / 1048576, 2)
    except Exception:
        pass
    return snap


def _host_fingerprint(before: dict, after: dict, wall_sec: float) -> dict:
    """Collapse two snapshots into the compact per-run fingerprint.

    idle_frac is idle jiffies / total jiffies over the bench window
    across ALL host CPUs: on an otherwise-idle 32-cpu host a bench using
    ~8 effective cores leaves idle_frac ≈ 0.75; idle_frac near 0 with
    our own cpu count unchanged means external contention. steal_frac
    > ~0.02 means the hypervisor throttled us.
    """
    fp = {
        "load1_before": before.get("load1"),
        "load1_after": after.get("load1"),
        "load5_after": after.get("load5"),
        "mem_avail_gb": before.get("mem_avail_gb"),
        "cached_gb_before": before.get("cached_gb"),
        "ncpu": os.cpu_count(),
        "wall_sec": round(wall_sec, 1),
    }
    jb, ja = before.get("jiffies"), after.get("jiffies")
    if jb and ja and ja["total"] > jb["total"]:
        dt = ja["total"] - jb["total"]
        fp["idle_frac"] = round((ja["idle"] - jb["idle"]) / dt, 3)
        fp["iowait_frac"] = round((ja["iowait"] - jb["iowait"]) / dt, 3)
        steal = (ja["steal"] - jb["steal"]) / dt
        fp["steal_frac"] = round(steal, 3)
        if steal > STEAL_GATE:
            # Timings in this file are inflated by hypervisor throttling
            # (r12: 5.9 % steal ≈ 1.2-3.5× uniform inflation) — compare
            # rounds on a clean re-run, not on this one.
            fp["steal_contaminated"] = True
    return fp

STEAL_GATE = 0.01  # steal_frac above this marks the round contaminated


def _steal_probe(window_s: float = 3.0) -> float | None:
    """Steal fraction over a short sampling window. steal is only
    observable as a jiffy delta, so the probe sleeps ``window_s``
    between two /proc/stat reads — cheap next to a multi-minute bench."""
    b = _host_snapshot().get("jiffies")
    if not b:
        return None
    time.sleep(window_s)
    a = _host_snapshot().get("jiffies")
    if not a or a["total"] <= b["total"]:
        return None
    return (a["steal"] - b["steal"]) / (a["total"] - b["total"])


def _wait_for_idle_host(max_wait_s: float, poll_s: float = 15.0) -> dict:
    """Bounded wait-for-idle gate (VERDICT r9 ask #3; steal gate r12 #6).

    The r9 driver bench started at load1 = 22.67 on a 32-cpu host and
    polluted 3 queries up to 2× — provably host contention (the same
    tree at load1 = 0.74 matched r8). loadavg is host-wide, so waiting
    for it to drain is the one lever a bench process has against noisy
    neighbours. Gate: proceed once load1 < 2 × ncpu/16 (= 4.0 on this
    32-cpu container), give up after ``max_wait_s`` and run anyway —
    a bench that never runs is worse than a flagged-noisy one. The
    returned marker lands in the JSON ``host`` block either way, so a
    hot-host round is self-documenting (waited vs gave_up vs clean).

    The r12 driver bench passed the load gate yet inflated 1.2-3.5×
    from 5.9 % hypervisor CPU steal (steal is invisible to loadavg), so
    the gate also probes steal_frac over a 3 s window and keeps waiting
    while it exceeds STEAL_GATE; the post-run fingerprint independently
    stamps ``steal_contaminated`` so a steal spike DURING the run is
    readable from the JSON alone (BASELINE.md §host-contamination).
    """
    ncpu = os.cpu_count() or 16
    threshold = 2.0 * ncpu / 16.0
    t0 = time.monotonic()
    waited = 0.0
    load1 = _host_snapshot().get("load1")
    steal = _steal_probe()
    gate: dict = {"load1_gate": threshold, "steal_gate": STEAL_GATE}
    if steal is not None:
        gate["steal_pre"] = round(steal, 4)
    while (load1 is not None and load1 >= threshold) or (
        steal is not None and steal > STEAL_GATE
    ):
        remaining = max_wait_s - (time.monotonic() - t0)
        if remaining <= 0:
            gate["gate_gave_up"] = True
            break
        # the steal probe's sampling window IS the poll sleep (ADVICE
        # r13: a separate sleep(poll_s) + 3 s probe per iteration was
        # pure added latency) — one jiffy delta over the whole wait.
        window = min(poll_s, remaining)
        probe_t0 = time.monotonic()
        steal = _steal_probe(window)
        if steal is None and time.monotonic() - probe_t0 < window:
            # jiffy-less host: the probe abstained BEFORE its sleep, so
            # sleep here or the loop busy-spins on getloadavg (ADVICE
            # r14; kept in-loop rather than inside _steal_probe so the
            # PRE-loop probe stays instant on such hosts).
            time.sleep(window)
        waited = time.monotonic() - t0
        load1 = _host_snapshot().get("load1")
        if steal is not None:
            gate["steal_pre"] = round(steal, 4)
    if waited:
        gate["gated_wait_s"] = round(waited, 2)
    return gate


# The 24-query headline set benched every round since r2 — the anchor for
# round-over-round comparison. Round 7 added the heaviest analytics plans
# (pagerank_deep / triangles / association_rules, VERDICT r6 ask #4) to
# the bench set for a wall-time ledger; `value*_anchor24` keeps the
# cross-round totals comparable by summing ONLY this frozen set.
ANCHOR_24 = frozenset([
    "ads_top_brands", "curation_decontaminate", "curation_pack_chunks",
    "curation_tfidf_top_terms", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "dwd_cdc_dim_upsert", "dwd_page_views",
    "dwm_order_detail_wide", "dwm_order_wide", "dws_keyword_stats",
    "dws_product_stats", "dws_province_stats", "dws_session_stats",
    "dws_visitor_stats", "scale_bucketed_join", "sim_ann_topk",
    "sim_block_topk", "sim_embedding_neardup_lsh", "sim_ivf_topk",
    "t3_jump_out", "text_quality_scores", "tpch_q1",
])


def _cap_errors(errors: dict[str, str], budget: int = 1200) -> dict[str, str]:
    """Hard-cap the errors blob for the JSON line.

    Failed queries are excluded from the totals, which makes `value`
    incomparable with a fully-green round. The error TEXT is
    reconstructible by re-running, so it sits with the other
    head-truncatable detail and is hard-capped (~1.2 KB total) — an
    unbounded blob would evict queries_median/anchor24/sf from the
    driver's 2000-char tail in exactly the broken rounds the
    tail-recovery path exists for. The budget charges key names as well
    as message bytes (ADVICE r8: names and per-entry placeholders are
    themselves unbounded across a many-failure round); once exhausted, a
    single summary key replaces the remainder.
    """
    capped: dict[str, str] = {}
    for i, (name, msg) in enumerate(errors.items()):
        msg = msg[:120]
        cost = len(name) + len(msg)
        if budget - cost < 0:
            capped["truncated"] = f"{len(errors) - i} more"
            break
        budget -= cost
        capped[name] = msg
    return capped


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    gate = _wait_for_idle_host(
        max_wait_s=float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_S", "600"))
    )
    spark = get_spark("flink-gmall-bench")
    host_before = _host_snapshot()
    bench_t0 = time.perf_counter()

    # warmup: JVM + parquet footer caches, not the queries under test
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Failure isolation: one broken query must cost one null row, never the
    # whole BENCH file (round 3 lost ALL numbers to a single source-typing
    # regression). Errors go to stderr; the JSON line always prints.
    # SPARK_GRAFT_BENCH_ONLY=name1,name2 scopes the run (VERDICT r14
    # ask #2: re-measuring a composite hole must not cost a full
    # 54-query attempt). Scoped attempts pool into the clean-window
    # composite like any other (tools/bench_clean_composite.py keys
    # per-query), and the output records the scope for auditability.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    only = {n for n in only_env.split(",") if n} or None
    timings: dict[str, float | None] = {}
    medians: dict[str, float | None] = {}
    cold: dict[str, float | None] = {}
    steal_q: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(registry().items()):
        if not q.bench or (only and name not in only):
            continue
        # Per-query steal window (VERDICT r13 ask #6): the r13 episode
        # was BURSTY (pagerank clean, visitor_stats 4x), so one
        # whole-run steal_contaminated flag discards salvageable
        # medians; a jiffy delta around each query's cold+warm loop
        # stamps exactly which timings the hypervisor touched.
        jq = _host_snapshot().get("jiffies")
        try:
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 3)
            warm: list[float] = []
            for _ in range(WARM_RUNS):
                t0 = time.perf_counter()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                warm.append(time.perf_counter() - t0)
            timings[name] = round(warm[0], 3)
            medians[name] = round(statistics.median(warm), 3)
        except Exception as e:  # noqa: BLE001 — isolate per query by design
            timings[name] = None
            medians[name] = None
            cold[name] = None
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        ja = _host_snapshot().get("jiffies")
        if jq and ja and ja["total"] > jq["total"]:
            steal_q[name] = round(
                (ja["steal"] - jq["steal"]) / (ja["total"] - jq["total"]), 4
            )

    total = round(sum(v for v in timings.values() if v is not None), 3)
    # KEY ORDER IS LOAD-BEARING: the driver's BENCH_r{N}.json has twice
    # (r6, r7) arrived with `parsed: null` and only the LAST 2000 chars of
    # the line preserved as `tail`. The fields a cross-round compare needs
    # most — queries_median, the anchor24 subtotals, sf — therefore go at
    # the END of the JSON line so they survive any head truncation;
    # first-warm and cold detail (reconstructible by re-running) go first.
    # tools/bench_compare.py knows how to recover the tail segment.
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "warm_runs": WARM_RUNS,
        "queries": timings,
        "value_cold": round(sum(v for v in cold.values() if v is not None), 3),
        "queries_cold": cold,
        # head-side (reconstructible): per-query steal fractions; the
        # tail-side host block carries the compact max/count summary.
        "queries_steal": steal_q,
    }
    if errors:
        out["errors"] = _cap_errors(errors)
    out.update(
        {
            "value_median": round(
                sum(v for v in medians.values() if v is not None), 3
            ),
            "queries_median": medians,
            "value_anchor24": round(
                sum(
                    v for k, v in timings.items() if k in ANCHOR_24 and v is not None
                ),
                3,
            ),
            "value_median_anchor24": round(
                sum(
                    v for k, v in medians.items() if k in ANCHOR_24 and v is not None
                ),
                3,
            ),
            # Host fingerprint sits tail-side so it survives the driver's
            # 2000-char truncation alongside the numbers it contextualizes.
            "host": {
                **_host_fingerprint(
                    host_before, _host_snapshot(), time.perf_counter() - bench_t0
                ),
                **gate,
                # per-query steal summary (detail in queries_steal): a
                # steal_contaminated run whose n_steal_q is small is
                # PARTIALLY salvageable — compare only the clean rows.
                "steal_q_max": max(steal_q.values(), default=None),
                "n_steal_q": sum(
                    1 for v in steal_q.values() if v > STEAL_GATE
                ),
            },
            "sf": sf,
            "n_failed": len(errors),
        }
    )
    if only:
        out["scoped_to"] = sorted(only)
    print(json.dumps(out))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
