#!/usr/bin/env python3
"""DuckDB side of the SF1 Q1/Q6 anchor: times the reference-style baseline
(DuckDB over the same parquet graft reads) so BASELINE.md carries a measured
absolute ratio instead of a relative inference. Mirrors the reference's
benchmarks/tpch harness shape (Q1/Q6 at SF1, repeated, best-of).
Date literals are shifted to the synthetic data's 1995-2001 shipdate range
at TPC-H's selectivities: Q1 covers 96.2% of rows (dbgen: 98.5%), Q6
selects 2.0% (dbgen: 1.9%)."""
import sys, time, json, duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
con = duckdb.connect()
con.execute(f"SET threads={threads}")
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')")
import os
has_q3 = os.path.exists(f"{d}/orders.parquet")
if has_q3:
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{d}/customer.parquet')")

Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-08-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
Q6 = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# Q3 join anchor (r16): same adapted literals as TpchAnchor.q3 — the
# synthetic schema has no o_shippriority, so o_orderpriority stands in.
Q3 = """
SELECT l_orderkey,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-04-01'
  AND l_shipdate > TIMESTAMP '1998-04-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

out = {"threads": threads}
queries = [("q1", Q1), ("q6", Q6)] + ([("q3", Q3)] if has_q3 else [])
for name, q in queries:
    times = []
    rows = None
    for _ in range(5):
        t0 = time.time()
        rows = con.execute(q).fetchall()
        times.append(time.time() - t0)
    out[name] = round(min(times), 4)
    out[name + "_rows"] = len(rows)
print(json.dumps(out))
