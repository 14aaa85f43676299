#!/usr/bin/env python3
"""Round-over-round bench comparison with canary normalization
(round-9 verdict item 6: make machine drift vs code drift mechanical).

Inputs: two bench records — each either a driver BENCH_r{N}.json capture
(with the final Bench line in "tail"), a Bench artifact
(target/bench_latest.json with {"final": ...}), or a raw Bench stdout
capture. The per-query ratio table is scaled by the canary ratio
(new_canary / old_canary, min(start,end) each side — pure machine
speed), so a box that got uniformly 1.3x slower reports normalized
ratios ~= 1 instead of a wall of false regressions.

Usage: python3 tools/bench_report.py BENCH_r09.json target/bench_latest.json
"""
import json
import re
import statistics
import sys


def load(path):
    """-> (queries {short: sec}, canary float|None)"""
    txt = open(path).read()
    try:
        doc = json.loads(txt)
    except json.JSONDecodeError:
        doc = {"tail": txt}
    if isinstance(doc, dict) and "final" in doc:  # Bench artifact
        f = doc["final"]
        return f["queries"], min(f["canary"]["start"], f["canary"]["end"])
    blob = doc.get("tail", "") if isinstance(doc, dict) else ""
    if isinstance(doc, dict) and "queries" in doc:  # bench_baseline / plain
        canary = doc.get("canary")
        if isinstance(canary, dict):
            canary = min(canary.get("start", -1), canary.get("end", -1))
        return doc["queries"], canary
    qs = dict((k, float(v)) for k, v in
              re.findall(r'"(q[0-9a-z]+)":([0-9.]+)', blob))
    m = re.search(r'"canary":\{"start":([0-9.]+),"end":([0-9.]+)\}', blob)
    canary = min(float(m.group(1)), float(m.group(2))) if m else None
    # the tail regex also catches canary/value keys — drop non-query keys
    qs = {k: v for k, v in qs.items() if re.fullmatch(r"q\d+[0-9a-z_]*", k)}
    return qs, canary


def main(argv):
    old_q, old_c = load(argv[0])
    new_q, new_c = load(argv[1])
    cratio = (new_c / old_c) if old_c and new_c else 1.0
    shared = sorted(k for k in old_q if k in new_q and old_q[k] > 0 and new_q[k] > 0)
    rows = []
    for k in shared:
        raw = new_q[k] / old_q[k]
        rows.append((k, old_q[k], new_q[k], raw, raw / cratio))
    norm = [r[4] for r in rows]
    print(f"canary: old={old_c} new={new_c} ratio={cratio:.3f}")
    print(f"shared queries: {len(rows)}; median raw ratio "
          f"{statistics.median(r[3] for r in rows):.3f}; "
          f"median canary-normalized {statistics.median(norm):.3f}")
    print(f"{'query':22s} {'old':>7s} {'new':>7s} {'raw':>6s} {'norm':>6s}")
    for k, a, b, raw, nm in sorted(rows, key=lambda r: -r[4]):
        flag = " <-- code-suspect" if nm > 1.5 and b >= 0.3 else ""
        print(f"{k:22s} {a:7.3f} {b:7.3f} {raw:6.2f} {nm:6.2f}{flag}")


if __name__ == "__main__":
    main(sys.argv[1:])
