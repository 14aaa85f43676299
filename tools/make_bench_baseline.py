#!/usr/bin/env python3
"""Freeze a Bench run as the canary-normalization reference.

Reads a `target/bench_latest.json` (the Bench artifact: {"final": {...},
"benchq": [...]}) and writes `bench_baseline.json` holding the per-query
medians plus ONE canary number (min of start/end — the least-disturbed
observation of the box). Bench embeds canary-normalized deltas against
this file in its final JSON line, so every future BENCH_r{N}.json
mechanically separates machine drift (raw ratio tracks the canary
ratio, normalized ratio ~= 1) from code drift (normalized ratio moves).

Usage: python3 tools/make_bench_baseline.py [target/bench_latest.json] \
         [bench_baseline.json]
"""
import json
import sys


def main(argv):
    src = argv[0] if argv else "target/bench_latest.json"
    dst = argv[1] if len(argv) > 1 else "bench_baseline.json"
    final = json.load(open(src))["final"]
    canary = min(final["canary"]["start"], final["canary"]["end"])
    doc = {"canary": canary, "queries": final["queries"]}
    with open(dst, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
    print(f"{dst}: {len(final['queries'])} queries, canary {canary}")


if __name__ == "__main__":
    main(sys.argv[1:])
