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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("flink-gmall-bench")

    # warmup: JVM + parquet footer caches, not the queries under test
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Failure isolation: one broken query must cost one null row, never the
    # whole BENCH file (round 3 lost ALL numbers to a single source-typing
    # regression). Errors go to stderr; the JSON line always prints.
    timings: dict[str, float | None] = {}
    medians: dict[str, float | None] = {}
    cold: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(registry().items()):
        if not q.bench:
            continue
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
    }
    if errors:
        # Failed queries are excluded from the totals, which makes `value`
        # incomparable with a fully-green round. The error TEXT is
        # reconstructible by re-running, so it sits with the other
        # head-truncatable detail and is hard-capped (~1.2 KB total) —
        # an unbounded blob here would evict queries_median/anchor24/sf
        # from the driver's 2000-char tail in exactly the broken rounds
        # the tail-recovery path exists for. Only the tiny n_failed flag
        # goes LAST so any tail survival shows the round was not green.
        budget = 1200
        capped = {}
        for name, msg in errors.items():
            msg = msg[:120]
            if budget - len(msg) < 0:
                capped[name] = "..."
                continue
            budget -= len(msg)
            capped[name] = msg
        out["errors"] = capped
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
            "sf": sf,
            "n_failed": len(errors),
        }
    )
    print(json.dumps(out))
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
