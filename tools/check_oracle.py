#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads each Verify output parquet (outDir/<name>/) and the dumped
oracle_sql.json, runs each oracle against DuckDB views over the same
sf parquet tables, and compares: column names (sorted), row counts,
and cell values (exact; floats reported with max abs diff).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # keep any spill inside target/ (a runaway query once wrote 60 GB of
    # duckdb_temp_storage into the repo cwd) and bound memory
    con.execute("SET temp_directory='/root/repo/target/duckdb_tmp'")
    con.execute("SET max_temp_directory_size='5GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # --only-dumped: skip oracles whose dump dir is absent — for
    # SPARK_GRAFT_VERIFY_FILTER-focused local runs. The default keeps a
    # missing dump a FAIL (the driver-t2 semantics: a query that failed
    # to dump must not silently pass).
    if "--only-dumped" in sys.argv:
        import os
        oracle = {n: s for n, s in oracle.items()
                  if os.path.isdir(f"{out_dir}/{n}")}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows){' ' + msg if msg else ''}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: spark={gc} oracle={wc}"
    if len(got) != len(want):
        return False, f"row count differs: spark={len(got)} oracle={len(want)}"
    got, want = got[gc], want[wc]
    max_f = 0.0
    for c in gc:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if hasattr(x, "__len__") and not isinstance(x, str):
                # array/list cell: compare element lists
                xs = list(x) if x is not None else None
                ys = list(y) if y is not None else None
                if xs != ys:
                    return False, f"col {c} row {i}: {xs!r} != {ys!r}"
                continue
            fx = isinstance(x, float) and math.isnan(x)
            fy = isinstance(y, float) and math.isnan(y)
            if fx or fy:
                # pandas renders SQL NULL as NaN for float cols
                xn = x is None or fx
                yn = y is None or fy
                if xn and yn:
                    continue
                return False, f"col {c} row {i}: {x!r} != {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                try:
                    fxv, fyv = float(x), float(y)
                except Exception:
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
                if fxv != fyv:
                    d = abs(fxv - fyv)
                    max_f = max(max_f, d)
                    if d > 0:
                        return False, (f"col {c} row {i}: float {fxv!r} != {fyv!r} "
                                       f"(absdiff {d:g})")
            elif x != y:
                if str(x) == str(y):
                    continue
                return False, f"col {c} row {i}: {x!r} != {y!r} (types {type(x).__name__}/{type(y).__name__})"
    msg = f"[max float diff {max_f:g}]" if max_f else ""
    return True, msg

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
