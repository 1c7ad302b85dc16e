#!/usr/bin/env python3
"""Merge bench sweeps at 4/8/16/32 cores into per-config minima and
emit the SCALING.md core-count scaling report (dev tool; the bench
itself is graft.Bench). Per-config MIN across repeats is the noise
robust estimator on a shared box — the floor is the code's cost, the
excursions are the neighbors'."""
import glob
import json
import sys


def main(out="SCALING.md"):
    runs = []
    for path in glob.glob(".scaling_*.jsonl"):
        for line in open(path):
            line = line.strip()
            if not line or line == "DONE":
                continue
            d = json.loads(line)
            if "result" in d and d["result"]:
                runs.append((d["cpus"], d["result"]))
    by_cpu = {}
    for c, r in runs:
        by_cpu.setdefault(c, []).append(r)
    cpus = sorted(by_cpu)
    # per-query minima, then totals of minima (per-run totals mix one
    # run's noise into every query; min-per-query composes the floors)
    table = {}
    for c in cpus:
        qmins = {}
        for r in by_cpu[c]:
            for q, s in r["queries"].items():
                qmins[q] = min(qmins.get(q, 1e9), s)
        table[c] = qmins
    # intersection across configs: a partial sweep (killed mid-run)
    # must not crash the report, and per-query rows only make sense
    # for queries present at every core count
    queries = sorted(set.intersection(
        *(set(table[c]) for c in cpus)))
    lines = []
    lines.append("# Core-count scaling (sf0.1, per-config best of "
                 f"{max(len(v) for v in by_cpu.values())} runs)")
    lines.append("")
    lines.append("`graft.Bench` at `local[c]` with shuffle partitions = c. "
                 "Per-query MINIMUM across repeats (shared-box noise "
                 "excursions removed); totals are sums of those floors.")
    lines.append("")
    hdr = "| cores | " + " | ".join(str(c) for c in cpus) + " |"
    lines.append(hdr)
    lines.append("| --- |" + " --- |" * len(cpus))
    totals = {c: sum(table[c][q] for q in queries) for c in cpus}
    lines.append("| total (s) | " +
                 " | ".join(f"{totals[c]:.1f}" for c in cpus) + " |")
    base = totals[cpus[0]]
    lines.append(f"| speedup vs {cpus[0]} | " +
                 " | ".join(f"{base / totals[c]:.2f}x" for c in cpus) + " |")
    lines.append("")
    lines.append("Heaviest queries (seconds at each core count):")
    lines.append("")
    lines.append("| query | " + " | ".join(str(c) for c in cpus) + " |")
    lines.append("| --- |" + " --- |" * len(cpus))
    heavy = sorted(queries, key=lambda q: -table[cpus[0]][q])[:10]
    for q in heavy:
        lines.append(f"| {q} | " +
                     " | ".join(f"{table[c][q]:.2f}" for c in cpus) + " |")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:12]))
    print(f"... wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
