#!/usr/bin/env python
"""Compare two bench_suite JSON files row by row (regression check).

The reference's perf workflow is tagged CSV runs compared offline
(src/main.rs:200-262, measurements/perf_log_<tag>_*.csv); this is that
workflow for the suite JSONs `scripts/bench_suite.py` writes. Prints a
Markdown delta table and exits nonzero if any shared row regressed by more
than --threshold (default 15%, above typical chip-state window noise for
same-session-vs-same-session comparisons; cross-window comparisons shift
8-25% wholesale — read the table, not just the exit code).
"""

import argparse
import json
import sys


def load_rows(path):
    data = json.load(open(path))
    return {
        r["name"]: r["result"]
        for r in data.get("rows", [])
        if r.get("result")
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="relative regression that fails the check")
    args = ap.parse_args(argv)

    old, new = load_rows(args.old), load_rows(args.new)
    shared = [n for n in old if n in new]
    if not shared:
        print("no shared successful rows to compare", file=sys.stderr)
        return 2

    regressions = []
    print("| row | old ms | new ms | delta |")
    print("|---|---:|---:|---:|")
    for name in shared:
        o, n = old[name]["value"], new[name]["value"]
        if not isinstance(o, (int, float)) or o <= 0:
            print(f"| {name} | {o} | {n} | incomparable (old value <= 0) |")
            continue
        rel = (n - o) / o
        flag = " **REGRESSED**" if rel > args.threshold else ""
        print(f"| {name} | {o:.2f} | {n:.2f} | {rel:+.1%}{flag} |")
        if rel > args.threshold:
            regressions.append(name)
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nrows only in old: {', '.join(only_old)}")
    if only_new:
        print(f"rows only in new: {', '.join(only_new)}")
    if regressions:
        print(f"\n{len(regressions)} row(s) regressed > {args.threshold:.0%}: "
              + ", ".join(regressions))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
