#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Reads each <outDir>/<query>/ parquet result written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json against DuckDB views over
the sf parquet tables, and compares: columns sorted by name, rows sorted by
all columns, exact value match.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} exp={len(e)}"
        else:
            gs = g.astype(str)
            es = e.astype(str)
            neq = (gs != es)
            if neq.any().any():
                bad_cols = [c for c in gs.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                results[name] = (f"VALUE_MISMATCH cols={bad_cols} first_row={idx} "
                                 f"got={g.iloc[idx].to_dict()} exp={e.iloc[idx].to_dict()}")
            else:
                results[name] = f"OK rows={len(g)}"
    width = max(len(k) for k in results) if results else 0
    nok = 0
    for k in sorted(results):
        status = results[k]
        print(f"{k:<{width}}  {status}")
        if status.startswith("OK") or status.startswith("ROWS_ONLY"):
            nok += 1
    print(f"\n{nok}/{len(results)} pass")
    missing = set(oracle) - set(results)
    if missing:
        print(f"MISSING RESULTS (query failed in Verify): {sorted(missing)}")
        sys.exit(1)

if __name__ == "__main__":
    main()
