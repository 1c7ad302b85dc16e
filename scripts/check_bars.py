#!/usr/bin/env python3
"""Check a bench JSON line against every BENCH_BASELINE.md regression
bar.

BENCH_BASELINE.md entries follow the convention

    - **q_name X s / Y cpu ...** ... Bar: > N s.

i.e. the bar is the wall-clock budget the row must stay UNDER. A row
may appear in several round blocks (re-based); the NEWEST block (the
file is newest-first) governs, so the first occurrence of each query
name wins.

Parsing is PER-ENTRY: the file is split on the '- **q_' entry
delimiter and the bar is extracted within each entry only, so an
entry without its own Bar line can never capture a later entry's bar
(the round-16 defect: non-greedy DOTALL matching crossed entry
boundaries, misassigning bars and silently dropping coverage). An
entry with no Bar line is reported as a warning.

Usage: python3 scripts/check_bars.py [bench.json] [BENCH_BASELINE.md]
Exit 0 = every barred row under its bar; exit 1 otherwise.
"""
import json
import re
import sys


def parse_bars(path):
    """First (newest) bar per query name; never crosses entries.

    Returns (bars, uncovered): an entry chunk ends at the next
    '- **q_' delimiter OR any markdown heading line, so a 'Bar: >'
    sitting in intervening non-entry prose can never be attributed to
    the preceding entry. `uncovered` lists names whose newest entry
    carries no bar anywhere in the file — callers fail on it.
    """
    text = open(path).read()
    bars = {}
    unbarred = []
    # '- **q_name ...' opens an entry; the next '- **q_' entry OR a
    # block heading ('#...') closes it, so a chunk holds exactly one
    # entry's prose and never a following block's
    blocks = re.split(r"(?m)^#{1,6} ", text)
    for block in blocks:
        chunks = re.split(r"(?m)^- \*\*(q_[a-z0-9_]+)", block)
        # chunks = [preamble, name1, body1, name2, body2, ...]
        for name, body in zip(chunks[1::2], chunks[2::2]):
            # the ' s' unit suffix is conventional but has drifted in
            # a few entries ('Bar: > 4.') — the number alone is the bar
            m = re.search(r"Bar: > ([0-9]+(?:\.[0-9]+)?)", body)
            if m is None:
                if name not in bars:
                    unbarred.append(name)
                continue
            bars.setdefault(name, float(m.group(1)))
    uncovered = sorted(set(n for n in unbarred if n not in bars))
    for name in uncovered:
        print(f"WARN {name}: entry has no Bar line — no coverage")
    return bars, uncovered


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r16_local.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.md"
    bench = json.loads(open(bench_path).readline())
    queries = bench["queries"]
    bars, uncovered = parse_bars(base_path)
    if not bars:
        print("no bars parsed — pattern rot?")
        return 1
    failures, ratios = [], []
    # a barless entry is a coverage HOLE, not a warning: it exits
    # nonzero so the gap cannot silently persist across rounds
    failures.extend(uncovered)
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
