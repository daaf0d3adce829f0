#!/usr/bin/env python
"""Composite CLEAN-WINDOW bench view across contaminated attempts.

The round-13/14 noisy-neighbor episodes are BURSTY: a whole-run
`steal_contaminated` stamp discards runs in which most queries' own
measurement windows were actually quiet. bench.py stamps a per-query
steal fraction (`queries_steal`, VERDICT r13 ask #6); this tool reads
every `BENCH_local_<round>_attempt*.json`, keeps each query's medians
ONLY from attempts where that query's own window was clean
(steal <= gate AND the attempt carried no co-runner load flags), and
emits one composite JSON line with the same `queries_median` /
`value_median_anchor24` fields a clean run would have, plus per-query
provenance counts.

Usage: python tools/bench_clean_composite.py [r14] [--exclude sub1,sub2]
A query with NO clean window in any attempt is reported null and
counted in `n_never_clean` — the composite is honest about holes.
--exclude drops attempts whose filename contains any given substring —
for attempts KNOWN to have overlapped a same-host dev workload, which
inflates windows without tripping the steal stamp (the excluded names
are recorded in the output for auditability).
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEAL_GATE = 0.01
# same frozen set as bench.py's ANCHOR_24 (import avoided: bench.py
# builds a SparkSession registry import chain this tool must not pay)
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    rnd = args[0] if args and not args[0].startswith("--") else "r14"
    excl: list[str] = []
    if "--exclude" in args:
        excl = args[args.index("--exclude") + 1].split(",")
    files = sorted(glob.glob(os.path.join(REPO, f"BENCH_local_{rnd}_attempt*.json")))
    attempts, excluded = [], []
    for f in files:
        base = os.path.basename(f)
        if any(e in base for e in excl):
            excluded.append(base)
            continue
        try:
            attempts.append((base, json.load(open(f))))
        except Exception:
            continue
    if not attempts:
        print(json.dumps({"error": f"no parsable attempts for {rnd}"}))
        return

    from bench import ANCHOR_24  # constant only; no Spark started

    per_q: dict[str, list[float]] = {}
    prov: dict[str, int] = {}
    names = set()
    for _fname, d in attempts:
        qs = d.get("queries_steal", {})
        med = d.get("queries_median", {})
        names.update(med)
        for q, v in med.items():
            if v is None:
                continue
            s = qs.get(q)
            if s is None or s > STEAL_GATE:
                continue  # this query's own window was stolen from
            per_q.setdefault(q, []).append(v)
            prov[q] = prov.get(q, 0) + 1

    comp = {
        q: (round(statistics.median(vs), 3) if (vs := per_q.get(q)) else None)
        for q in sorted(names)
    }
    never = sorted(q for q, v in comp.items() if v is None)
    anchor = [v for q, v in comp.items() if q in ANCHOR_24 and v is not None]
    out = {
        "metric": "clean_composite_median",
        "round": rnd,
        "n_attempts": len(attempts),
        "queries_median": comp,
        "queries_clean_windows": prov,
        "n_never_clean": len(never),
        "never_clean": never,
        "value_median": round(sum(v for v in comp.values() if v is not None), 3),
        "value_median_anchor24": round(sum(anchor), 3),
        "anchor24_complete": len(anchor) == len(ANCHOR_24),
        "steal_gate": STEAL_GATE,
        "excluded_attempts": excluded,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
