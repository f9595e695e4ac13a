#!/usr/bin/env python3
"""Equal-posture comparison of two bench artifacts (the BASELINE.md rule,
mechanized): refuses to compare artifacts whose `cpus` or `heap_gb`
differ or whose reps are storm-stamped, then reports total/median ratios
and every per-query regression above the threshold.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]

Exit code 1 if any query regressed beyond the threshold (tripwire use),
2 if the artifacts are not comparable.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv):
    thr = 2.0
    if "--threshold" in argv:
        i = argv.index("--threshold")
        thr = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    old, new = load(argv[0]), load(argv[1])

    problems = []
    for field in ("cpus", "heap_gb"):
        if old.get(field) != new.get(field):
            problems.append(f"{field}: {old.get(field)} vs {new.get(field)}")
    for name, art in (("old", old), ("new", new)):
        storms = art.get("rep_storm", [])
        if any(storms):
            problems.append(f"{name} artifact is storm-stamped: {storms}")
    if problems:
        print("NOT COMPARABLE (BASELINE.md rule):")
        for p in problems:
            print(f"  - {p}")
        return 2

    # Artifacts missing the contract fields (a truncated tail capture, a
    # summary-only line) and artifact pairs with no positive-timed common
    # query are "nothing comparable", not a traceback (round-10 advice).
    qo, qn = old.get("queries"), new.get("queries")
    if not isinstance(qo, dict) or not isinstance(qn, dict):
        print("NOT COMPARABLE: artifact missing a 'queries' map "
              f"(old: {type(qo).__name__}, new: {type(qn).__name__})")
        return 2
    common = sorted(k for k in qo if k in qn and qo[k] > 0 and qn[k] > 0)
    if not common:
        print("NOT COMPARABLE: no positive-timed queries in common "
              f"(old has {len(qo)}, new has {len(qn)})")
        return 2
    ratios = {k: qn[k] / qo[k] for k in common}
    med = statistics.median(ratios.values())
    tot_o = old.get("value")
    tot_n = new.get("value")
    tot = (f"old total {tot_o:.1f}s  new total {tot_n:.1f}s"
           if isinstance(tot_o, (int, float)) and isinstance(tot_n, (int, float))
           else "totals unavailable (missing 'value' field)")
    print(f"common queries: {len(common)}  {tot}  "
          f"median per-query ratio {med:.3f}")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"new-only queries ({len(only_new)}): "
              + ", ".join(f"{k}={qn[k]:.2f}s" for k in only_new))

    regressions = sorted(
        ((r, k) for k, r in ratios.items() if r > thr), reverse=True)
    if regressions:
        print(f"REGRESSIONS above {thr}x:")
        for r, k in regressions:
            print(f"  {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s ({r:.2f}x)")
        return 1
    print(f"no query regressed beyond {thr}x")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
