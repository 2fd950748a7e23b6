#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracles. Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import duckdb, json, sys, glob, os, math

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in oracles:
        print(f"{name:24s} rows-only: {len(got)} rows")
        continue
    exp = con.execute(oracles[name]).fetchdf()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    ok = True
    if list(got.columns) != list(exp.columns):
        print(f"{name:24s} COLS MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
        ok = False
    elif len(got) != len(exp):
        print(f"{name:24s} ROWS MISMATCH got={len(got)} exp={len(exp)}")
        ok = False
    else:
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        for c in got.columns:
            gv, ev = gs[c].tolist(), es[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                same = (a == b) or (a is None and b is None)
                try:
                    if not same and isinstance(a, float) and isinstance(b, float):
                        same = (math.isnan(a) and math.isnan(b)) or a == b
                except Exception:
                    pass
                if not same and str(a) == str(b):
                    same = True
                if not same:
                    print(f"{name:24s} VALUE MISMATCH col={c} row={i}: got={a!r} exp={b!r}")
                    ok = False
                    break
            if not ok:
                break
    if ok:
        print(f"{name:24s} OK ({len(got)} rows)")
    else:
        fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
