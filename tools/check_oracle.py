#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by `graft.Verify`),
runs the matching SQL from oracle_sql.json in DuckDB with the sf tables
registered by name, then compares: schema (sorted column names), row
count, and a hash over values with columns sorted by name and rows
sorted. Exit 1 if any query mismatches.
"""
import sys, json, glob, hashlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6f}")
            elif isinstance(v, bytes):
                row.append(v.hex())
            else:
                row.append(str(v))
        rows.append("|".join(row))
    rows.sort()
    return cols, len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest(), rows

only = set(sys.argv[3:])  # optional query-name filter for fast iteration

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = duckdb.connect().execute("select 1")  # noop
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        duck_df = con.execute(sql).df()
        sc, sn, sh, srows = canon(spark_df)
        dc, dn, dh, drows = canon(duck_df)
        if sc != dc:
            print(f"FAIL {name}: schema {sc} vs {dc}")
            fails += 1
        elif sn != dn:
            print(f"FAIL {name}: rows {sn} vs {dn}")
            fails += 1
        elif sh != dh:
            bad = next((i for i, (a, b) in enumerate(zip(srows, drows)) if a != b), -1)
            print(f"FAIL {name}: hash mismatch; first diff row {bad}:")
            print(f"  spark: {srows[bad][:200] if bad >= 0 else '?'}")
            print(f"  duck : {drows[bad][:200] if bad >= 0 else '?'}")
            fails += 1
        else:
            print(f"OK   {name}: {sn} rows")
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
        fails += 1

# queries without oracle → rows-only
import os
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = qdir.rstrip("/").split("/")[-1]
    if only and name not in only:
        continue
    if name not in oracle and name != "_metrics":
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{qdir}*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:200]}")
            fails += 1

sys.exit(1 if fails else 0)
