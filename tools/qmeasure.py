#!/usr/bin/env python
"""Per-query optimization-loop harness (guide §1): time named registry
queries through the noop sink on the bench session shape and dump
explain("formatted") to plans/<round>/<name>_<tag>.txt.

Usage: python tools/qmeasure.py [--tag before|after] [--runs N]
       [--round r16] [--plan-only] name1 name2 ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_gmall_spark.registry import registry
from flink_gmall_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    tag = "probe"
    runs = 5
    rnd = "r16"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--round":
            rnd = args[i + 1]
            i += 2
        elif args[i] == "--plan-only":
            runs = -1
            i += 1
        else:
            names.append(args[i])
            i += 1
    if runs < 0 and tag not in ("before", "after"):
        # --plan-only with the non-dumping default tag wrote no file at
        # all (ADVICE r15); a plan-only run's whole point is the dump.
        tag = "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(plan_dir, exist_ok=True)
    reg = registry()
    spark = get_spark("qmeasure")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # footer warmup
    for name in names:
        q = reg[name]
        spark.sparkContext.setJobDescription(name)
        df = q.fn(spark, sf_dir)
        if tag in ("before", "after"):
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if runs < 0:
            print(f"{name}: plan dumped", flush=True)
            continue
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        warm: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm.append(time.perf_counter() - t0)
        med = statistics.median(warm) if warm else float("nan")
        print(
            f"{name}: cold={cold:.3f} warm_median={med:.3f} "
            f"warm=[{', '.join(f'{w:.3f}' for w in warm)}]",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
