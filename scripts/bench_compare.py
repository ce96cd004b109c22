#!/usr/bin/env python3
"""Compare two BENCH_FULL.json artifacts per query.

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [threshold_pct]

Prints queries whose |delta| exceeds the threshold (default 15%) on a
meaningful base (max(old, new) > 0.2s), plus totals. Exit 0 iff none exceed.

Window normalization: when BOTH artifacts carry `window_factor` (the
fixed synthetic canary timed first in a fresh session; 1.0 = the pinned
reference window), every new-side time is divided by the factor RATIO
(new_factor / old_factor) before the delta test — a run recorded in a
1.5x-degraded host window no longer reads as a 50% engine regression.
The raw (unnormalized) numbers are still what gets printed, alongside
the ratio, so nothing is hidden by the adjustment.

The retimed block of the NEW artifact, when present, is used to adjudicate:
a flagged query whose retime lands back inside the threshold is reported as
a placement artifact, not a regression.
"""
import json, sys

def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.15
    oq, nq = old["queries"], new["queries"]
    retimed = new.get("retimed", {})
    wf_old, wf_new = old.get("window_factor", 0), new.get("window_factor", 0)
    wratio = (wf_new / wf_old) if wf_old and wf_new and wf_old > 0 and wf_new > 0 else 1.0
    shared = sorted(set(oq) & set(nq))
    flagged, artifacts = [], []
    for k in shared:
        a, b = oq[k], nq[k]
        if max(a, b) <= 0.2:
            continue
        d = (b / wratio - a) / a
        if abs(d) > thr:
            r = retimed.get(k)
            if r is not None and r > 0 and abs(r / wratio - a) / a <= thr:
                artifacts.append((k, a, b, r))
            else:
                flagged.append((k, a, b, d))
    print(f"shared queries: {len(shared)}  old total: {sum(oq[k] for k in shared):.1f}s"
          f"  new total: {sum(nq[k] for k in shared):.1f}s"
          + (f"  window ratio new/old: {wratio:.2f} (normalized)" if wratio != 1.0
             else "  (no window normalization)"))
    for k, a, b, r in artifacts:
        print(f"  placement-artifact {k}: {a:.2f} -> {b:.2f} (retimed {r:.2f}, inside threshold)")
    for k, a, b, d in sorted(flagged, key=lambda x: -abs(x[3])):
        print(f"  FLAG {k}: {a:.2f} -> {b:.2f} ({d*100:+.0f}% window-normalized)")
    new_only = sorted(set(nq) - set(oq))
    if new_only:
        print(f"new-only queries: {', '.join(new_only)}")
    sys.exit(1 if flagged else 0)

if __name__ == "__main__":
    main()
