#!/usr/bin/env python3
"""Scale-slope report over per-SF bench artifacts (round-10 verdict #8).

Reads the three BENCH_LOCAL_r10_slope_sf*.json artifacts (same query set,
same width/heap posture, clean-gated) and computes each query's measured
scaling exponent between adjacent scale factors:

    slope = log(t_hi / t_lo) / log(sf_hi / sf_lo)

A slope of 1.0 is perfectly linear in SF; < 1 means fixed per-query
overhead still dominates at these sizes (expected for iterative/streaming
ops at local scale); sustained > 1.2 on the top decade (sf0.01 -> sf0.1,
where overhead matters least) flags super-linear work growth worth a plan
audit. Emits a markdown table for SURVEY.md plus a JSON summary.

Usage: python3 tools/slope_report.py slope_sf0.001.json slope_sf0.01.json slope_sf0.1.json [--out SUMMARY.json]

--out defaults to BENCH_LOCAL_r10_slopes.json (the heavies' summary);
pass it explicitly when sloping a different query set so the default
artifact is not clobbered.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    sf = float(d["sf"].rstrip("/").split("sf")[-1])
    return sf, d


def main(paths):
    out = "BENCH_LOCAL_r10_slopes.json"
    if "--out" in paths:
        i = paths.index("--out")
        out = paths[i + 1]
        paths = paths[:i] + paths[i + 2:]
    runs = sorted((load(p) for p in paths), key=lambda t: t[0])
    sfs = [sf for sf, _ in runs]
    queries = sorted(runs[-1][1]["queries"])
    rows = []
    for q in queries:
        walls = [d["queries"].get(q, -1.0) for _, d in runs]
        cpus = [d.get("cpu", {}).get(q, -1.0) for _, d in runs]
        if any(w <= 0 for w in walls):
            rows.append((q, walls, cpus, None, None, None, None))
            continue
        # top-decade slope (least overhead-polluted) + full-range slope
        top = math.log(walls[-1] / walls[-2]) / math.log(sfs[-1] / sfs[-2])
        full = math.log(walls[-1] / walls[0]) / math.log(sfs[-1] / sfs[0])
        # CPU slopes: the contention-immune signal (round-10 lesson — the
        # d05 positive control shows cpu-slope 1.17 while local[32] wall
        # hides the quadratic entirely). Sub-10ms CPU samples are below the
        # listener's resolution floor; skip the slope rather than divide
        # noise by noise.
        ctop = cfull = None
        if all(c > 0.01 for c in cpus):
            ctop = math.log(cpus[-1] / cpus[-2]) / math.log(sfs[-1] / sfs[-2])
            cfull = math.log(cpus[-1] / cpus[0]) / math.log(sfs[-1] / sfs[0])
        rows.append((q, walls, cpus, top, full, ctop, cfull))

    print(f"| query | " + " | ".join(f"wall sf{sf} (s)" for sf in sfs) +
          " | wall slope 0.01→0.1 | cpu sf0.1 (s) | cpu slope 0.01→0.1 | verdict |")
    print("|---|" + "---|" * (len(sfs) + 4))
    flagged = []
    for q, walls, cpus, top, full, ctop, cfull in rows:
        if top is None:
            print(f"| {q} | " + " | ".join("-" for _ in walls) +
                  " | n/a | n/a | n/a | FAILED rep |")
            continue
        # verdict on the WORSE of the wall and CPU top-decade slopes: CPU is
        # the honest work measure at local[32] where idle cores hide wall,
        # but a shuffle/IO-bound query can grow super-linear in wall while
        # its CPU stays linear — flag on either (round-11 advice)
        basis = max(top, ctop) if ctop is not None else top
        verdict = "super-linear — AUDIT" if basis > 1.2 else (
            "~linear" if basis > 0.6 else "overhead-dominated")
        if basis > 1.2:
            flagged.append(q)
        ctop_s = f"{ctop:.2f}" if ctop is not None else "below-floor"
        print(f"| {q} | " + " | ".join(f"{w:.2f}" for w in walls) +
              f" | {top:.2f} | {cpus[-1]:.2f} | {ctop_s} | {verdict} |")
    summary = {
        "sfs": sfs,
        "slopes": {q: {"top_decade": top, "full_range": full,
                       "cpu_top_decade": ctop, "cpu_full_range": cfull,
                       "walls": walls, "cpus": cpus}
                   for q, walls, cpus, top, full, ctop, cfull in rows
                   if top is not None},
        "flagged_superlinear": flagged,
    }
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("\nflagged super-linear (max of wall/cpu top-decade slopes > 1.2): "
          f"{flagged or 'none'}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:])
