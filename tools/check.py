#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes graft.Verify has already written outDir/<name>/ parquet dirs and
outDir/oracle_sql.json. Runs each oracle SQL in DuckDB over the same sf
tables and compares: schema (column names), row count, and values (exact
for non-floats, 1e-9 rel tolerance for floats, plus an exact-string hash
check to approximate the driver's strict hash compare).
"""
import duckdb, json, math, sys, os, glob

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    resdir = f"{out}/{name}"
    if not os.path.isdir(resdir):
        results[name] = "MISSING_RESULT"
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{resdir}/*.parquet')").fetchall()
        gcols = [d[0] for d in con.sql(
            f"SELECT * FROM read_parquet('{resdir}/*.parquet') LIMIT 0").description]
        rel = con.sql(sql)
        exp = rel.fetchall()
        ecols = [d[0] for d in rel.description]
    except Exception as e:
        results[name] = f"ERROR: {e}"
        continue
    # driver sorts columns by name before hashing
    gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
    eidx = sorted(range(len(ecols)), key=lambda i: ecols[i])
    if sorted(gcols) != sorted(ecols):
        results[name] = f"SCHEMA: got {sorted(gcols)} want {sorted(ecols)}"
        continue
    # driver's hash is type-sensitive to EXOTIC types: DuckDB HUGEINT vs
    # Spark BIGINT failed r11's gate even with equal values, while plain
    # int-width differences (INTEGER vs BIGINT) pass. Normalize the common
    # numeric widths and flag everything else that differs.
    def tnorm(t):
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"):
            return "INT"
        if t in ("FLOAT", "DOUBLE"):
            return "FLOAT"
        return t
    try:
        gtypes = {r[0]: tnorm(r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{resdir}/*.parquet')").fetchall()}
        etypes = {r[0]: tnorm(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        tdiff = [(c, gtypes.get(c), etypes.get(c)) for c in sorted(gtypes)
                 if gtypes.get(c) != etypes.get(c)]
        if tdiff:
            results[name] = f"TYPE: {tdiff}"
            continue
    except Exception:
        pass  # DESCRIBE can fail on exotic relations; value pass still runs
    if len(got) != len(exp):
        results[name] = f"ROWS: got {len(got)} want {len(exp)}"
        continue
    def norm(rows, idx):
        return sorted([tuple(r[i] for i in idx) for r in rows], key=lambda t: str(t))
    g, e = norm(got, gidx), norm(exp, eidx)
    bad = None
    exact = True
    for rg, re_ in zip(g, e):
        for vg, ve in zip(rg, re_):
            if vg == ve:
                continue
            exact = False
            if isinstance(vg, float) and isinstance(ve, float):
                if math.isnan(vg) and math.isnan(ve):
                    continue
                if abs(vg - ve) <= 1e-9 * max(1.0, abs(ve)):
                    continue
            bad = (vg, ve)
            break
        if bad:
            break
    if bad:
        results[name] = f"VALUE: got {bad[0]!r} want {bad[1]!r}"
    elif not exact:
        results[name] = "APPROX (floats within tol but not bit-equal — hash may fail)"
    else:
        results[name] = "OK"

w = max(len(n) for n in results) if results else 0
nok = sum(1 for v in results.values() if v == "OK")
for n in sorted(results):
    print(f"{n:<{w}}  {results[n]}")
print(f"\n{nok}/{len(results)} OK")
sys.exit(0 if nok == len(results) else 1)
