#!/usr/bin/env python3
"""Scale the driver's sf0.1 lineitem x10 to an SF1-sized anchor table.

The sandbox has no egress, so dbgen/duckdb-tpch are unavailable; instead the
6M-row anchor replicates sf0.1's lineitem ten times with shifted order keys.
Value columns (quantity, price, discount, flags, dates) keep their exact
distributions, so Q1/Q6 — pure scan+filter+agg over value columns — do the
same work per row as on dbgen data at SF1 (6,001,215 rows there; 6,000,000
here). Keys only matter to Q1/Q6 via cardinality of the scan, not joins.

Usage: python3 tools/gen_tpch_sf1.py [outdir]
"""
import sys, duckdb, os

out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT l_orderkey + i * 10000000 AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('/root/testdata/sf0.1/lineitem.parquet'),
       range(10) t(i)
) TO '{out}/lineitem.parquet' (FORMAT parquet, ROW_GROUP_SIZE 1048576)
""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/lineitem.parquet')").fetchone()[0]
print(f"wrote {out}/lineitem.parquet rows={n}")
