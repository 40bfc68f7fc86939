#!/usr/bin/env python3
"""Generate src/test/resources/duckdb_cross_engine.parquet: DuckDB-computed
rounding and inner-product results over pseudo-random inputs, consumed by
CrossEngineSpec. Inputs AND results travel as parquet doubles (bit-exact) —
a decimal-string transport loses a ulp between engine parsers, which is not
how the real gate moves values.
"""
import random
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

random.seed(20260812)
xs = [random.uniform(-1000, 1000) for _ in range(500)]
xs += [round(random.uniform(0, 1), 5) + random.choice([0, 1e-16, -1e-16]) for _ in range(500)]
vas = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(500)]
vbs = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(500)]

# 1000 rounding rows (dummy vectors) + 500 dot rows (dummy x)
pq.write_table(pa.table({
    "x": pa.array(xs + [0.0] * 500, pa.float64()),
    "a": pa.array([[0.0] * 8] * 1000 + vas, pa.list_(pa.float64())),
    "b": pa.array([[0.0] * 8] * 1000 + vbs, pa.list_(pa.float64())),
    "is_round": pa.array([True] * 1000 + [False] * 500),
}), "/tmp/cross_inputs.parquet")
con = duckdb.connect()
con.sql("""
  COPY (
    SELECT x, a, b, is_round,
           round(x, 4) AS r4, round(x, 6) AS r6,
           list_inner_product(a, b) AS dot
    FROM '/tmp/cross_inputs.parquet'
  ) TO 'src/test/resources/duckdb_cross_engine.parquet' (FORMAT PARQUET)
""")
n = con.sql("SELECT count(*) FROM 'src/test/resources/duckdb_cross_engine.parquet'").fetchone()[0]
print(f"wrote {n} fixture rows")
