#!/usr/bin/env python3
"""Generate the SURVEY §0 gate tally from a graft.Verify dump directory.

Usage: python3 tools/tally.py /tmp/verify_out [CORRECTNESS_rN.json]

Counts come from the dump itself (never hand-written): ran entries = result
dirs, oracle entries = oracle_sql.json keys, rows-only = entries with no
oracle. With a CORRECTNESS json, also reports hash-match counts.
"""
import json, os, sys

out = sys.argv[1]
oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
ran = sorted(d for d in os.listdir(out)
             if os.path.isdir(os.path.join(out, d)))
declared_rows_only = sorted(set(ran) - set(oracles))
missing = sorted(set(oracles) - set(ran))
print(f"Gate: {len(ran)} ran entries, {len(oracles)} with DuckDB oracles, "
      f"{len(declared_rows_only)} rows-only by design "
      f"({', '.join(declared_rows_only)}).")
if missing:
    print(f"WARNING: {len(missing)} oracle entries produced no result: "
          f"{', '.join(missing)}")
if len(sys.argv) > 2:
    c = json.load(open(sys.argv[2]))
    hm = sum(1 for v in c.values() if v.get("hash_match") is True)
    err = sorted(k for k, v in c.items()
                 if v.get("err") not in (None, "no_oracle"))
    print(f"Driver correctness: {len(c)} entries, {hm} hash-match, "
          f"{len(err)} errored{': ' + ', '.join(err) if err else ''}.")
