#!/usr/bin/env python3
"""Generate the EMPTY and ONE-ROW twin corpora for the degenerate sweep:
every table of a source sf dir re-written with LIMIT 0 / LIMIT 1 so the
whole query surface can be driven against zero-row and single-row inputs
(the sweep SCALE.md records each round). Schemas ride along verbatim;
DuckDB re-types NANOS timestamps to micros, which graft.core.Tables
normalises on read either way.

Usage: gen_degenerate.py <srcSfDir> <outParent>
Writes <outParent>/empty/*.parquet and <outParent>/onerow/*.parquet.
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, out = sys.argv[1], sys.argv[2]
    for mode, limit in [("empty", 0), ("onerow", 1)]:
        dst = os.path.join(out, mode)
        os.makedirs(dst, exist_ok=True)
        for t in TABLES:
            duckdb.sql(
                f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT {limit}) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{mode}: {len(TABLES)} tables -> {dst}")


if __name__ == "__main__":
    main()
