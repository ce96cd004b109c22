#!/usr/bin/env python3
"""Compare two BENCH_FULL.json artifacts per query.

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [threshold_pct] [--force]

Prints queries whose |delta| exceeds the threshold (default 15%) on a
meaningful base (max(old, new) > 0.2s), plus totals. Exit 0 iff none exceed.

Window normalization: when BOTH artifacts carry `window_factor` (the
fixed synthetic canary timed first in a fresh session; 1.0 = the pinned
reference window), every new-side time is divided by the factor RATIO
(new_factor / old_factor) before the delta test — a run recorded in a
1.5x-degraded host window no longer reads as a 50% engine regression.
The raw (unnormalized) numbers are still what gets printed, alongside
the ratio, so nothing is hidden by the adjustment.

Run quality (r12 verdict directive 8): every comparison prints each
side's `run_quality` verdict — the artifact's own field when present
(r13+ artifacts carry it), else derived here from the retimed block
(undercuts: retime > 20% and > 0.3s BELOW the main number — the
documented contamination signature; >= 3 undercuts = degraded,
>= 1 = suspect). A DEGRADED side makes the whole comparison
meaningless (the r12 snapshot seeded exactly this confusion), so the
script REFUSES (exit 2) unless --force is given, and then annotates
every line as tainted.

The retimed block of the NEW artifact, when present, is used to adjudicate:
a flagged query whose retime lands back inside the threshold is reported as
a placement artifact, not a regression.
"""
import json, os, sys

def load(path):
    """A bench artifact: either the engine's own full format (has a
    `queries` map) or the driver's wrapper `{n, rc, tail, parsed}` —
    BENCH_r{N}.json wraps the run and truncates `parsed.queries`, with
    `parsed.full` naming the full artifact the driver committed beside
    it. Resolve the pointer (same directory, value-matched so a later
    run overwriting that file can't masquerade as this one); fall back
    to the truncated map with a loud note."""
    art = json.load(open(path))
    if "queries" in art:
        return art
    p = art.get("parsed")
    if not isinstance(p, dict) or "queries" not in p:
        sys.exit(f"{path}: no queries map (neither full format nor driver wrapper)")
    full = p.get("full")
    if isinstance(full, str):
        cand = os.path.join(os.path.dirname(os.path.abspath(path)), full)
        if os.path.exists(cand):
            f = json.load(open(cand))
            # require the value field PRESENT on both sides: None == None
            # would let a later value-less run masquerade as this one
            if ("queries" in f and "value" in f and "value" in p
                    and f["value"] == p["value"]):
                return f
    print(f"NOTE: {path} is a driver wrapper whose full artifact "
          f"({full!r}) is missing or from a different run — comparing its "
          f"TRUNCATED query map ({len(p['queries'])} rows)")
    return p

def run_quality(art):
    """(verdict, n_undercuts, label): the artifact's own field, else derived.

    r14+ artifacts drop the always-zero published-undercut field (retime
    publication makes it definitionally 0 — r13 ADVICE); the raw
    pre-publication count is the informative number where present. The
    label says WHICH count is being shown: a pre-r14 artifact's
    `retime_undercuts` is the published (post-substitution) count, ~0 by
    construction — printing it as "raw" would misread an old run's fast
    phase as uninflamed when its raw diagnostic was never recorded.
    """
    q = art.get("queries", {})
    retimed = art.get("retimed", {})
    under = sum(1 for k, r in retimed.items()
                if r and r > 0 and k in q and q[k] - r > 0.3 and r < 0.8 * q[k])
    own = art.get("run_quality")
    if own:
        if "retime_undercuts_raw" in art:
            return own, art["retime_undercuts_raw"], "raw retime undercuts"
        if "retime_undercuts" in art:
            return own, art["retime_undercuts"], ("published retime undercuts" +
                " (pre-r14 artifact; raw count was not recorded)")
        return own, under, "derived retime undercuts"
    return ("degraded" if under >= 3 else "suspect" if under >= 1 else "ok"
            ), under, "derived retime undercuts"

def main():
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    old = load(args[0])
    new = load(args[1])
    thr = float(args[2]) / 100 if len(args) > 2 else 0.15
    oq, nq = old["queries"], new["queries"]
    retimed = new.get("retimed", {})
    wf_old, wf_new = old.get("window_factor", 0), new.get("window_factor", 0)
    wratio = (wf_new / wf_old) if wf_old and wf_new and wf_old > 0 and wf_new > 0 else 1.0

    q_old, u_old, l_old = run_quality(old)
    q_new, u_new, l_new = run_quality(new)
    print(f"run_quality old: {q_old} ({u_old} {l_old}"
          + (f", wf {old['window_factor']:.2f}->{old['window_factor_end']:.2f}"
             if "window_factor_end" in old else "") + ")"
          f"  new: {q_new} ({u_new} {l_new}"
          + (f", wf {new['window_factor']:.2f}->{new['window_factor_end']:.2f}"
             if "window_factor_end" in new else "") + ")")
    # r14+: rows whose automatic fresh-session re-run did not resolve a
    # >3x-vs-history reading — per-row implausibility inside a window the
    # canaries may still call flat (the r13 9-19x blind spot)
    for side, art in (("old", old), ("new", new)):
        anoms = art.get("row_anomalies", [])
        if anoms:
            reruns = art.get("row_reruns", {})
            detail = ", ".join(
                f"{a} (rerun {reruns[a]:.2f}s)" if reruns.get(a, -1) > 0 else a
                for a in anoms)
            print(f"ROW ANOMALIES ({side}): {detail} — these rows read >3x "
                  f"their previous median and a fresh-session re-run did not "
                  f"resolve them; treat their deltas as unadjudicated")
    degraded = [s for s, v in (("old", q_old), ("new", q_new)) if v == "degraded"]
    if degraded:
        msg = (f"REFUSING comparison: {' and '.join(degraded)} artifact(s) are "
               f"run_quality=degraded — the documented discard rule; re-run the "
               f"bench in a recovered window (pass --force to compare anyway)")
        if not force:
            print(msg)
            sys.exit(2)
        print(msg.replace("REFUSING", "WARNING (--force): proceeding with a") +
              " — every delta below is TAINTED")

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
    taint = " [TAINTED: degraded side]" if degraded else ""
    print(f"shared queries: {len(shared)}  old total: {sum(oq[k] for k in shared):.1f}s"
          f"  new total: {sum(nq[k] for k in shared):.1f}s"
          + (f"  window ratio new/old: {wratio:.2f} (normalized)" if wratio != 1.0
             else "  (no window normalization)") + taint)
    for k, a, b, r in artifacts:
        print(f"  placement-artifact {k}: {a:.2f} -> {b:.2f} (retimed {r:.2f}, inside threshold){taint}")
    for k, a, b, d in sorted(flagged, key=lambda x: -abs(x[3])):
        print(f"  FLAG {k}: {a:.2f} -> {b:.2f} ({d*100:+.0f}% window-normalized){taint}")
    new_only = sorted(set(nq) - set(oq))
    if new_only:
        print(f"new-only queries: {', '.join(new_only)}")
    sys.exit(1 if flagged else 0)

if __name__ == "__main__":
    main()
