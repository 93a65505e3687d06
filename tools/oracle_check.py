"""Local replica of the driver's DuckDB oracle comparison.

Usage: python3 tools/oracle_check.py [sfDir] [verifyOutDir]
Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first (at sf0.01 so the
q_el_* oracle dumps under /tmp/graft_oracle are written).
"""
import duckdb, json, os, sys, glob
import pandas as pd, numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
oracle = json.load(open(f"{out}/oracle_sql.json"))

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')" if os.path.isdir(p)
                else f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

results = {}
for name in sorted(os.listdir(out)):
    if not name.startswith("q_"): continue
    spark_df = pd.read_parquet(f"{out}/{name}")
    if name not in oracle:
        results[name] = {"err": "no_oracle", "spark_rows": len(spark_df)}
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
        s, o = canon(spark_df), canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        hashm = False
        detail = ""
        if rows and schema:
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
                hashm = True
            except AssertionError as e:
                detail = str(e).split("\n")[0][:200]
                # check with tolerance to see if it's a float issue
                try:
                    pd.testing.assert_frame_equal(s, o, check_dtype=False, atol=1e-9, rtol=1e-9)
                    detail += " [close-within-1e-9]"
                except AssertionError:
                    pass
        results[name] = {"rows": rows, "schema": schema, "exact": hashm,
                         "spark_rows": len(s), "oracle_rows": len(o), "detail": detail}
    except Exception as e:
        results[name] = {"err": str(e)[:300], "spark_rows": len(spark_df)}

ok = sum(1 for r in results.values() if r.get("exact"))
for k, v in results.items():
    flag = "OK " if v.get("exact") else ("no-oracle" if v.get("err") == "no_oracle" else "FAIL")
    print(f"{flag:9s} {k} {json.dumps({a:b for a,b in v.items() if a!='detail' or b})}")
print(f"\n{ok} exact / {len(oracle)} oracles / {len(results)} queries")
with open("/tmp/oracle_check_results.json", "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)
sys.exit(0 if ok == len(results) else 1)
