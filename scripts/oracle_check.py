#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: for each query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sfDir parquet tables,
load the Spark result parquet, sort columns by name + rows by value, and
compare. Usage: oracle_check.py <sfDir> <outDir>."""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=sorted(df.columns)).reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) < 1e-12 or a == b
    return str(a) == str(b)

fails = []
for name, sql in sorted(oracles.items()):
    try:
        oracle = norm(con.execute(sql).fetchdf())
        spark = norm(duckdb.query(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf())
        ok = True
        if list(oracle.columns) != list(spark.columns):
            print(f"FAIL {name}: columns oracle={list(oracle.columns)} "
                  f"spark={list(spark.columns)}")
            ok = False
        elif len(oracle) != len(spark):
            print(f"FAIL {name}: rows oracle={len(oracle)} spark={len(spark)}")
            ok = False
        else:
            for i in range(len(oracle)):
                for c in oracle.columns:
                    if not cells_equal(oracle.iloc[i][c], spark.iloc[i][c]):
                        print(f"FAIL {name}: row {i} col {c}: "
                              f"oracle={oracle.iloc[i][c]!r} spark={spark.iloc[i][c]!r}")
                        ok = False
                        break
                if not ok:
                    break
        if ok:
            print(f"OK   {name} ({len(oracle)} rows)")
        else:
            fails.append(name)
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails.append(name)

print(f"\n{len(oracles) - len(fails)}/{len(oracles)} passed")
sys.exit(1 if fails else 0)
