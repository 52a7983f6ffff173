#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir: read the Spark parquet result and
run the matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, then compare row count, sorted column names, and a value hash
(columns sorted by name, rows sorted, values canonicalized).
"""
import json, sys, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    import os
    names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
    for name in names:
        spark_rel = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        if name not in oracles:
            results[name] = {"err": "no_oracle", "spark_rows": len(srows)}
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            results[name] = {"err": f"oracle_sql_error: {e}", "spark_rows": len(srows)}
            continue
        rm = len(srows) == len(orows)
        sm = sorted(scols) == sorted(ocols)
        hm = sm and table_hash(scols, srows) == table_hash(ocols, orows)
        results[name] = {"rows_match": rm, "schema_match": sm, "hash_match": hm,
                         "spark_rows": len(srows), "oracle_rows": len(orows), "err": None}
        if not (rm and sm and hm):
            print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}, schema {scols} vs {ocols}")
    ok = sum(1 for r in results.values() if r.get("hash_match"))
    noor = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    bad = {k: v for k, v in results.items()
           if not v.get("hash_match") and v.get("err") != "no_oracle"}
    print(f"\n{ok} pass, {noor} no_oracle, {len(bad)} FAIL of {len(results)}")
    for k, v in bad.items():
        print(f"  FAIL: {k}: {v}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
