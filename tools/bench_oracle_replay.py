#!/usr/bin/env python3
"""Like-for-like calibration of the engine against the DuckDB oracle replay:
time every query in oracle_sql.json in DuckDB over the same parquet tables
(warm-up pass, then best-of-2 — the judge's protocol), pair it with the
committed Spark timings in BENCH_full.json restricted to the SAME query set,
and emit one JSON object:

    {"spark_s": ..., "duckdb_s": ..., "ratio": ..., "n_queries": ...,
     "queries": {name: {"spark": s, "duckdb": s}, ...}}

`ratio` = spark_s / duckdb_s over the common queries — BASELINE.md's
"within 2x" gate is ratio <= 2.0. Committed per round as CALIBRATION.json.

Usage:
    bench_oracle_replay.py <sfDir> <oracle_sql.json> \
        [--bench BENCH_full.json] [--out CALIBRATION.json] [--threads N]
"""
import argparse
import json
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("oracle_json")
    ap.add_argument("--bench", default="BENCH_full.json")
    ap.add_argument("--out", default="CALIBRATION.json")
    ap.add_argument("--threads", type=int, default=0,
                    help="PRAGMA threads (0 = DuckDB default: all cores)")
    args = ap.parse_args()

    con = duckdb.connect()
    if args.threads:
        con.sql(f"PRAGMA threads={args.threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")
    oracle = json.load(open(args.oracle_json))
    bench = json.load(open(args.bench))["queries"]

    per_query = {}
    failed = []
    for name in sorted(oracle):
        if name not in bench or bench[name] < 0:
            continue  # no committed Spark timing to compare against
        sql = oracle[name]
        try:
            con.sql(sql).fetchall()  # warm-up: page cache + plan cache
            times = []
            for _ in range(2):
                t0 = time.time()
                con.sql(sql).fetchall()  # fetchall = consume every row,
                times.append(time.time() - t0)  # like Bench's noop sink
            per_query[name] = {"spark": bench[name],
                               "duckdb": round(min(times), 4)}
        except Exception as e:
            failed.append((name, str(e).splitlines()[0]))
    spark_s = round(sum(q["spark"] for q in per_query.values()), 3)
    duckdb_s = round(sum(q["duckdb"] for q in per_query.values()), 3)
    result = {
        "spark_s": spark_s,
        "duckdb_s": duckdb_s,
        "ratio": round(spark_s / duckdb_s, 3) if duckdb_s else None,
        "n_queries": len(per_query),
        "sf_dir": args.sf_dir,
        "queries": per_query,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: result[k] for k in
                      ("spark_s", "duckdb_s", "ratio", "n_queries")}))
    for name, msg in failed:
        print(f"SKIP {name}: {msg}")


if __name__ == "__main__":
    main()
