#!/usr/bin/env python3
"""Run-to-run hash-stability gate (r10 VERDICT item 2): compare two
independent Verify dump dirs (fresh JVM each) value-for-value and
ORDER-sensitively — any query whose dump is not run-stable is a latent
driver hash red even if each run individually passes the oracle.

Usage: python3 tools/check_stability.py <outDirA> <outDirB>
"""
import hashlib, json, os, sys
import duckdb


def digest(con, path):
    df = con.execute(
        f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchdf()
    cols = sorted(df.columns)
    h = hashlib.sha256()
    h.update(("|".join(cols) + "\n").encode())
    for c in cols:
        h.update(c.encode())
        for v in df[c]:
            h.update(repr(v).encode())
        h.update(b"\x00")
    return h.hexdigest(), len(df)


def main(a, b):
    con = duckdb.connect()
    names = sorted(json.load(open(f"{a}/oracle_sql.json")))
    n_ok = n_diff = n_miss = 0
    for name in names:
        pa, pb = f"{a}/{name}", f"{b}/{name}"
        if not (os.path.isdir(pa) and os.path.isdir(pb)):
            print(f"MISS {name}: dump absent in one run")
            n_miss += 1
            continue
        (ha, na), (hb, nb) = digest(con, pa), digest(con, pb)
        if ha == hb:
            n_ok += 1
        else:
            print(f"DIFF {name}: run A {na} rows {ha[:12]} vs "
                  f"run B {nb} rows {hb[:12]}")
            n_diff += 1
    print(f"\n{n_ok} stable, {n_diff} diff, {n_miss} missing")
    return 1 if (n_diff or n_miss) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
