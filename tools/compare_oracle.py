#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against the DuckDB oracle SQL.

Usage:
  python3 tools/compare_oracle.py /root/testdata/sf0.001 /tmp/verify_out [name...]

With names given, only those queries are compared (fast iteration on a
new operator). Driver-side python has duckdb + pyarrow installed; the
Scala library never depends on this.
"""
import json
import os
import sys

import duckdb


def norm(rows, cols):
    """Sort columns by name, round-trip through str for hash parity."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in idx))
    return sorted(out), [cols[i] for i in idx]


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        p = f"{sf}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    fails = 0
    n = 0
    for name in sorted(os.listdir(out)):
        d = f"{out}/{name}"
        if not os.path.isdir(d) or (only and name not in only):
            continue
        if name not in oracles:
            print(f"  {name}: NO ORACLE (rows-only)")
            continue
        n += 1
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        gcols = [c[0] for c in con.description]
        try:
            want = con.execute(oracles[name]).fetchall()
            wcols = [c[0] for c in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            fails += 1
            continue
        gn, gc = norm(got, gcols)
        wn, wc = norm(want, wcols)
        if gc != wc:
            print(f"FAIL {name}: schema {gc} vs {wc}")
            fails += 1
        elif gn != wn:
            print(f"FAIL {name}: rows {len(gn)} vs {len(wn)}")
            bad = [(a, b) for a, b in zip(gn, wn) if a != b][:3]
            for a, b in bad:
                print(f"   spark={a}\n   duck ={b}")
            fails += 1
        else:
            print(f"  ok {name} ({len(gn)} rows)")
    print(f"{n - fails}/{n} green")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
