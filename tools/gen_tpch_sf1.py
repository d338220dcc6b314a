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

# r16 (VERDICT r15 #4): orders + customer for the Q3 join anchor. Same x10
# replication with the SAME key shift as lineitem, so each replica's joins
# line up exactly like the source's — join fan-out per key stays constant.
con.execute(f"""
COPY (
  SELECT o_orderkey + i * 10000000 AS o_orderkey,
         o_custkey + i * 10000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('/root/testdata/sf0.1/orders.parquet'),
       range(10) t(i)
) TO '{out}/orders.parquet' (FORMAT parquet, ROW_GROUP_SIZE 1048576)
""")
con.execute(f"""
COPY (
  SELECT c_custkey + i * 10000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('/root/testdata/sf0.1/customer.parquet'),
       range(10) t(i)
) TO '{out}/customer.parquet' (FORMAT parquet, ROW_GROUP_SIZE 1048576)
""")
for t in ("orders", "customer"):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"wrote {out}/{t}.parquet rows={n}")
