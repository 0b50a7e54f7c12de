"""Render benchmark JSONL output as the docs/performance.md speedup table.

Usage: python benchmarks/run_benchmarks.py | tee results.jsonl
       python benchmarks/summarize.py results.jsonl
"""

import json
import sys


def main(path):
    rows = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        if d.get("value") is None:  # crash-tolerant FAILED marker
            rows.append((d["metric"], f"FAILED: {d.get('error', '?')[:60]}",
                         "—", "—"))
            continue
        speed = d.get("speedup_vs_cpu_anchor")
        util = ""
        if "hbm_frac" in d:
            util = f"{100 * d['hbm_frac']:.1f}% HBM"
            if d.get("mfu", 0) >= 0.001:
                util += f", {100 * d['mfu']:.1f}% MXU"
        rows.append((
            d["metric"],
            f"{d['value']:.4g} {d['unit']}",
            f"{speed:,.1f}x" if speed is not None else "—",
            util or "—",
        ))
    print("| Config | Result | vs CPU anchor | Utilization |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} |")


if __name__ == "__main__":
    main(sys.argv[1])
