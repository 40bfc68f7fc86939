#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sf parquet tables and
compare (schema-insensitively: columns sorted by name, rows sorted) with the
Spark-written parquet in outDir/<name>/.

Usage: check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        c = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    c.append("NaN")
                else:
                    c.append(repr(v))
            elif isinstance(v, list):
                c.append(repr([repr(x) if isinstance(x, float) else x for x in v]))
            else:
                c.append(repr(v))
        out.append(tuple(c))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name in sorted(oracle):
        sql = oracle[name]
        t0 = time.time()
        try:
            orc = con.sql(sql)
            ocols = [c.lower() for c in orc.columns]
            perm = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows = [tuple(r[i] for i in perm) for r in orc.fetchall()]
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [c.lower() for c in got.columns]
            gperm = sorted(range(len(gcols)), key=lambda i: gcols[i])
            grows = [tuple(r[i] for i in gperm) for r in got.fetchall()]
        except Exception as e:
            failures.append((name, f"spark output read failed: {e}"))
            continue
        if sorted(ocols) != sorted(gcols):
            failures.append((name, f"columns differ: oracle={sorted(ocols)} spark={sorted(gcols)}"))
            continue
        otypes = dict(zip(ocols, [str(t) for t in orc.types]))
        gtypes = dict(zip(gcols, [str(t) for t in got.types]))
        tdiff = {c: (otypes[c], gtypes[c]) for c in otypes if otypes[c] != gtypes[c]}
        if tdiff:
            failures.append((name, f"column types differ: {tdiff}"))
            continue
        co, cg = canon(orows), canon(grows)
        if len(co) != len(cg):
            failures.append((name, f"row count differs: oracle={len(co)} spark={len(cg)}"))
            continue
        if co != cg:
            diffs = [(a, b) for a, b in zip(co, cg) if a != b]
            failures.append((name, f"{len(diffs)} differing rows, first: oracle={diffs[0][0]} spark={diffs[0][1]}"))
            continue
        print(f"OK   {name} ({len(co)} rows, duckdb {time.time()-t0:.2f}s)")
    # queries without an oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        if name == "oracle_sql.json" or name in oracle:
            continue
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"ROWS {name} ({n} rows){' <-- EMPTY' if n == 0 else ''}")
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for name, msg in failures:
            print(f"FAIL {name}: {msg}")
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
