#!/usr/bin/env python
"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio]

Accepts either a raw bench.py line or the driver's BENCH_r{N}.json
wrapper ({"parsed": {...}}). A query is flagged when new/old exceeds the
ratio (default 1.3 — the round-over-round bar from the verdicts), when it
failed (null), or when it disappeared. Exit 1 if anything is flagged, so
this can gate a commit. Timings are only comparable between idle-machine
runs at the same sf/cpus (see ROADMAP.md round-4 stamp).
"""

from __future__ import annotations

import json
import sys


def _recover_from_tail(tail: str) -> dict:
    """Driver BENCH_r{N}.json files have twice (r6, r7) arrived with
    `parsed: null` and only the line's last 2000 chars in `tail`. The
    fields a compare needs — queries_median, the anchor24 subtotals, sf
    — sit at the END of bench.py's line (key order is deliberate since
    round 8), so they survive head truncation: recover them here instead
    of silently comparing against nothing."""
    import re

    out: dict = {}
    i = tail.find('"queries_median"')
    if i >= 0:
        seg = tail[i:]
        seg = seg[: seg.find("}") + 1]
        pairs = re.findall(r'"([a-zA-Z0-9_]+)":\s*(null|[0-9.]+)', seg)
        qm = {
            k: (None if v == "null" else float(v))
            for k, v in pairs
            if k != "queries_median"
        }
        if qm:
            out["queries_median"] = qm
    for scalar in ("value_median_anchor24", "value_anchor24", "value_median",
                   "sf", "n_failed"):
        m = re.search(rf'"{scalar}":\s*([0-9.]+)', tail)
        if m:
            out[scalar] = float(m.group(1))
    h = tail.find('"host"')
    if h >= 0:
        seg = tail[h:]
        seg = seg[: seg.find("}") + 1]
        pairs = re.findall(r'"([a-zA-Z0-9_]+)":\s*(null|-?[0-9.]+)', seg)
        host = {k: (None if v == "null" else float(v)) for k, v in pairs
                if k != "host"}
        if host:
            out["host"] = host
    return out


def classify_host(old: dict, new: dict) -> str | None:
    """Classify a round-over-round shift as host-load vs plan change
    (VERDICT r8 ask #3) from the bench-embedded host fingerprints.

    Heuristics, most-specific first; each names the evidence so the
    verdict writer can quote it:
    - steal_frac > 0.02 on either side → hypervisor throttling.
    - idle_frac dropped by > 0.15 between rounds, or load1 on the new
      run exceeds the old by > ncpu/4 → external CPU contention.
    - cached_gb fell by > 25 % → page-cache eviction (cold reads).
    Returns None when either side lacks a fingerprint (pre-r9 files).
    """
    ho, hn = old.get("host"), new.get("host")
    if not ho or not hn:
        return None
    notes = []
    for side, h in (("old", ho), ("new", hn)):
        if (h.get("steal_frac") or 0) > 0.02:
            notes.append(f"{side} run stolen {h['steal_frac']:.1%} of cpu "
                         "(hypervisor throttling)")
    io_, in_ = ho.get("idle_frac"), hn.get("idle_frac")
    if io_ is not None and in_ is not None and io_ - in_ > 0.15:
        notes.append(f"idle_frac fell {io_:.2f} -> {in_:.2f} "
                     "(external CPU contention on the new run)")
    lo, ln = ho.get("load1_before"), hn.get("load1_before")
    ncpu = hn.get("ncpu") or 32
    if lo is not None and ln is not None and ln - lo > ncpu / 4:
        notes.append(f"pre-run load1 {lo} -> {ln} (busy host at new-run start)")
    co, cn = ho.get("cached_gb_before"), hn.get("cached_gb_before")
    if co and cn is not None and cn < 0.75 * co:
        notes.append(f"page cache {co} -> {cn} GiB (cold reads on new run)")
    if notes:
        return "HOST-LOAD suspected: " + "; ".join(notes)
    return ("host fingerprints comparable (no contention signal) — a delta "
            "is attributable to the plan/code change")


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        p = d["parsed"]
        if p is None and d.get("tail"):
            p = _recover_from_tail(d["tail"])
            if p:
                print(f"  note  {path}: parsed=null, recovered "
                      f"{len(p.get('queries_median', {}))} medians from tail")
        d = p or {}
    return d


def q_of(d: dict) -> dict:
    """Prefer the looped medians (bench.py r6+) over single-shot warm
    timings — single shots carry ±50 % noise on sub-second queries and
    produced phantom regressions three rounds running."""
    return d.get("queries_median") or d.get("queries", {})


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    qo, qn = q_of(old), q_of(new)
    flagged = []
    for name in sorted(set(qo) | set(qn)):
        a, b = qo.get(name), qn.get(name)
        if name not in qn:
            flagged.append((name, a, b, "missing in new"))
        elif b is None:
            flagged.append((name, a, b, "failed (null)"))
        elif a is None or name not in qo:
            print(f"  new   {name}: {b:.3f}s (no old datapoint)")
        elif a > 0 and b / a > bar:
            flagged.append((name, a, b, f"{b / a:.2f}x > {bar}x"))
        else:
            print(f"  ok    {name}: {a:.3f}s -> {b:.3f}s")
    # Totals only sum the non-failed queries; when either side has failures
    # or a different query set, the denominators differ and the comparison
    # would be misleading — skip it instead.
    same_set = set(qo) == set(qn)
    no_fails = not old.get("n_failed") and not new.get("n_failed") and all(
        v is not None for v in list(qo.values()) + list(qn.values())
    )
    if same_set and no_fails:
        vo = old.get("value_median") or old.get("value")
        vn = new.get("value_median") or new.get("value")
        print(f"total: {vo} -> {vn}")
    else:
        print("total: SKIPPED (query sets differ or failures present — "
              "denominators not comparable)")
    verdict = classify_host(old, new)
    if verdict:
        print(f"host: {verdict}")
    else:
        print("host: no fingerprint on one or both sides (pre-r9 bench file)")
    for name, a, b, why in flagged:
        print(f"  FLAG  {name}: {a} -> {b}  [{why}]")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
