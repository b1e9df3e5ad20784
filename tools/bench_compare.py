#!/usr/bin/env python3
"""Per-query bench regression comparator (round-15 verdict #1): diff two
bench JSON artifacts (BENCH_r{N}.json headline lines or bench_full.json
files — any JSON object with a "queries" map and the events_per_sec
headline fields) and flag moves the host-noise model cannot explain.

Usage: tools/bench_compare.py <prev.json> <curr.json> [ratio]

Rules (ratio defaults to 1.3):
  - a query slower than ratio× its prior time AND slower by >0.5 s
    absolute is flagged REGRESSED (the absolute floor keeps 0.1→0.14 s
    JIT noise out of the report);
  - a query faster by the inverse margin is reported IMPROVED (info);
  - queries present on one side only are listed as ADDED/REMOVED;
  - the replication medians compare with the same ratio; their trial
    vectors, when present, are printed so a contended window is visible.

Exit code 1 iff any REGRESSED entry (ADDED/REMOVED/IMPROVED are info) —
so a round close can gate on it mechanically.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # the driver's BENCH_r*.json wraps the stdout line under "parsed";
    # bench_full.json and a raw stdout capture are the line itself
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    prev, curr = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    abs_floor = 0.5

    pq_, cq = prev.get("queries", {}), curr.get("queries", {})
    regressed, improved = [], []
    for name in sorted(set(pq_) & set(cq)):
        a, b = pq_[name], cq[name]
        if a is None or b is None or a <= 0 or b <= 0:
            continue  # failed entries carry -1: not comparable
        if b > a * ratio and b - a > abs_floor:
            regressed.append((name, a, b))
        elif a > b * ratio and a - b > abs_floor:
            improved.append((name, a, b))
    added = sorted(set(cq) - set(pq_))
    removed = sorted(set(pq_) - set(cq))

    for name, a, b in regressed:
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    for name, a, b in improved:
        print(f"improved  {name}: {a:.2f}s -> {b:.2f}s ({a / b:.2f}x)")
    if added:
        print(f"added   ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    # headline throughputs: higher is better, so the ratio inverts
    for key in ("events_per_sec", "events_per_sec_mix702010"):
        a, b = prev.get(key), curr.get(key)
        if a and b and a > 0 and b > 0:
            tag = "REGRESSED" if a > b * ratio else "ok       "
            print(f"{tag} {key}: {a:.0f} -> {b:.0f} events/s ({b / a:.2f}x)")
            if a > b * ratio:
                regressed.append((key, a, b))
    for side, d in (("prev", prev), ("curr", curr)):
        for key in ("repl_trials_eps", "mix_trials_eps", "loadavg_at_start"):
            if key in d:
                print(f"  {side} {key}: {d[key]}")

    npq = sum(1 for v in pq_.values() if v and v > 0)
    ncq = sum(1 for v in cq.values() if v and v > 0)
    print(f"== {len(regressed)} regressed, {len(improved)} improved, "
          f"{npq}->{ncq} timed queries ==")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
