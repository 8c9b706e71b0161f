#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify's parquet dumps against the oracle_sql.json it wrote,
executing each oracle in DuckDB over the same sf dir, and compares
row-for-row after sorting columns by name (mirroring the documented driver
behavior: sort columns by name, then hash values in row order).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr; flags any bit difference
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_typelist = [d[1] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_typelist = [d[1] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} "
                  f"oracle={sorted(exp_cols)}")
            failures += 1
            continue
        # dtype check (driver compares schemas): same DuckDB-visible type
        # per column name on both sides (captured before cursor reuse)
        exp_types = dict(zip(exp_cols, exp_typelist))
        got_types = dict(zip(got_cols, got_typelist))
        tbad = {c: (got_types[c], exp_types[c]) for c in exp_types
                if got_types[c] != exp_types[c]}
        if tbad:
            print(f"FAIL {name}: dtype mismatch {tbad}")
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        e_rows = [tuple(norm(r[i]) for i in eperm) for r in exp_rows]
        g_rows = [tuple(norm(r[i]) for i in gperm) for r in got_rows]
        if len(e_rows) != len(g_rows):
            print(f"FAIL {name}: rowcount spark={len(g_rows)} "
                  f"oracle={len(e_rows)}")
            failures += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g_rows, e_rows))
               if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(e_rows)} rows differ; "
                  f"first at {i}:\n  spark : {a}\n  oracle: {b}")
            failures += 1
        else:
            print(f"PASS {name}: {len(e_rows)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
