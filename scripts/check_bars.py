#!/usr/bin/env python3
"""Check a bench JSON line against every BENCH_BASELINE.md regression
bar.

BENCH_BASELINE.md entries follow the convention

    - **q_name X s / Y cpu ...** ... Bar: > N s.

i.e. the bar is the wall-clock budget the row must stay UNDER. A row
may appear in several round blocks (re-based); the NEWEST block (the
file is newest-first) governs, so the first occurrence of each query
name wins.

Usage: python3 scripts/check_bars.py [bench.json] [BENCH_BASELINE.md]
Exit 0 = every barred row under its bar; exit 1 otherwise.
"""
import json
import re
import sys


def parse_bars(path):
    """First (newest) bar per query name."""
    text = open(path).read()
    bars = {}
    # an entry runs from '- **q_name' to the next entry or block break
    for m in re.finditer(
            r"\*\*(q_[a-z0-9_]+) [0-9.]+ s.*?Bar: > ([0-9.]+) s",
            text, re.S):
        name, bar = m.group(1), float(m.group(2))
        bars.setdefault(name, bar)
    return bars


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r16_local.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.md"
    bench = json.loads(open(bench_path).readline())
    queries = bench["queries"]
    bars = parse_bars(base_path)
    if not bars:
        print("no bars parsed — pattern rot?")
        return 1
    failures, ratios = [], []
    for name, bar in sorted(bars.items()):
        wall = queries.get(name)
        if wall is None:
            print(f"MISSING {name} (bar {bar} s) — not in {bench_path}")
            failures.append(name)
            continue
        ratios.append((wall / bar, name))
        if wall > bar:
            failures.append(name)
            print(f"FAIL {name}: {wall:.2f} s over bar {bar} s")
    worst = max(ratios, default=(0, "-"))
    print(f"{len(bars) - len(failures)}/{len(bars)} bars pass; "
          f"aggregate {sum(queries[n] for n in bars if n in queries) / sum(bars.values()):.2f}x of budgets; "
          f"worst row {worst[1]} at {worst[0]:.2f}x")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
