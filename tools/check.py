#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against the DuckDB oracle (columns sorted by name, rows sorted,
exact value compare). Driver-side python only — NOT part of the library.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    dumped = {p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out}/*/")}
    for name in sorted(dumped):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"ok   {name}: rows-only ({n} rows)"); n_pass += 1
            continue
        mine = norm(con.sql(
            f"SELECT * FROM read_parquet({files!r})").df())
        try:
            ref = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs oracle {list(ref.columns)}")
            n_fail += 1; continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(ref)}")
            n_fail += 1; continue
        bad = []
        for c in mine.columns:
            a, b = mine[c], ref[c]
            try:
                def isna(x):
                    try: return bool(pd.isna(x))
                    except (TypeError, ValueError): return False
                eq = pd.Series(
                    [(isna(x) and isna(y)) or
                     (not isna(x) and not isna(y) and x == y)
                     for x, y in zip(a, b)], index=a.index)
                if not eq.all():
                    i = eq[~eq].index[0]
                    bad.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad[:3])}"); n_fail += 1
        else:
            sch_m = [str(t) for t in mine.dtypes]
            sch_r = [str(t) for t in ref.dtypes]
            note = "" if sch_m == sch_r else f"  [dtype diff: {sch_m} vs {sch_r}]"
            print(f"PASS {name} ({len(mine)} rows){note}"); n_pass += 1
    missing = set(oracle) - dumped
    for name in sorted(missing):
        print(f"FAIL {name}: oracle declared but no query output"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
