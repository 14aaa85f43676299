#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: run Verify's
parquet dumps against DuckDB oracle SQL on the same test tables.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").df()
        if name not in oracles:
            print(f"[SKIP] {name}: no oracle ({len(got)} rows)")
            continue
        # regression-fixture oracles are pinned to the driver gate's SF
        # (sf0.01); comparing another SF's output to them is meaningless
        if "_expected_sf001.parquet" in oracles[name] and \
                not sf_dir.rstrip("/").endswith("sf0.01"):
            print(f"[SKIP] {name}: fixture oracle pinned to sf0.01 ({len(got)} rows)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                # Driver gate hashes typed values: DuckDB HUGEINT (e.g. SUM over
                # BIGINT) surfaces here as float64 vs Spark's int64 and must FAIL.
                # (Nullable-int promotion can't cause a spurious kind mismatch:
                # both frames come through DuckDB's .df(), so matching data gets
                # matching dtypes; a one-sided NaN fails the value check anyway.)
                if a.dtype.kind != b.dtype.kind:
                    print(f"[FAIL] {name}.{c}: dtype mismatch {a.dtype} vs "
                          f"{b.dtype} (driver typed hash would differ)")
                    ok = False
                    continue
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    af = a.astype(float).to_numpy()
                    bf = b.astype(float).to_numpy()
                    same = (np.isnan(af) & np.isnan(bf)) | (af == bf)
                    if not same.all():
                        i = int(np.argmin(same))
                        print(f"[FAIL] {name}.{c}: row {i}: {af[i]!r} vs {bf[i]!r}")
                        ok = False
                else:
                    av = a.astype(str).to_numpy()
                    bv = b.astype(str).to_numpy()
                    if not (av == bv).all():
                        i = int(np.argmin(av == bv))
                        print(f"[FAIL] {name}.{c}: row {i}: {av[i]!r} vs {bv[i]!r} "
                              f"(dtypes {a.dtype}/{b.dtype})")
                        ok = False
        if ok:
            print(f"[PASS] {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([k for k in oracles])} oracles declared")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
