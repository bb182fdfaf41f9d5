#!/usr/bin/env python3
"""Dtype-skew gate: the driver hashes Verify dumps and oracle results
including their PHYSICAL types, so a value-exact pair can still
hash-mismatch when the dtypes differ (the r10 reds: DuckDB renders
HUGEINT — e.g. sum(BIGINT), ::HUGEINT — as float64 in fetchdf while the
Spark dump is int64/decimal).

For every query in oracle_sql.json with a dump dir present, fetch both
sides as pandas frames (columns sorted by name, the driver's protocol)
and compare per-column dtype kinds; for object columns compare the type
of the first non-null cell. Any mismatch is a latent driver hash red.

Usage: python3 tools/check_dtypes.py <sfDir> <verifyOutDir>
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kind(series):
    k = series.dtype.kind  # i/u int, f float, O object, b bool, M dt
    if k != "O":
        return k
    for v in series:
        if v is not None and not (isinstance(v, float) and v != v):
            return f"O:{type(v).__name__}"
    return "O:empty"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET temp_directory='/root/repo/target/duckdb_tmp'")
    con.execute("SET max_temp_directory_size='5GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_skew = n_err = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:160]}")
            n_err += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"SKEW {name}: columns spark={gc} oracle={wc}")
            n_skew += 1
            continue
        diffs = []
        for c in gc:
            kg, kw = kind(got[c]), kind(want[c])
            # int carriers (i/u) are hash-equivalent; anything else must
            # match exactly — float vs int is the r10 red class, and
            # object payload types (str vs Decimal vs int) differ in repr
            norm = lambda k: "i" if k in ("i", "u") else k
            if norm(kg) != norm(kw):
                diffs.append(f"{c}: spark={kg} oracle={kw}")
        if diffs:
            print(f"SKEW {name}: " + "; ".join(diffs))
            n_skew += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_skew} skew, {n_err} err")
    return 1 if (n_skew or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
