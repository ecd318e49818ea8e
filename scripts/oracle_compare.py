#!/usr/bin/env python3
"""Driver-style oracle compare: run oracle_sql.json in DuckDB over views on
the sf parquet tables, compare with Verify's dumped parquet (columns sorted
by name, rows sorted by all columns, values stringified)."""
import sys, os, json, glob
import duckdb, pandas as pd

vout, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
# ScaleUp fixtures carry events.ts as raw BIGINT nanos
try:
    tstype = str(con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0])
    if "INT" in tstype.upper():
        con.execute("CREATE MACRO epoch_ns(x) AS x")
except Exception:
    pass
oracles = json.load(open(f"{vout}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    def s(v):
        if pd.isna(v): return "NULL"
        if isinstance(v, float): return repr(v)
        return str(v)
    rows = sorted(tuple(s(v) for v in row) for row in df.itertuples(index=False))
    return rows

fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only: continue
    pq = f"{vout}/{name}"
    if not os.path.exists(pq): pq = f"{vout}/{name}.parquet"
    try:
        spark_df = pd.read_parquet(pq)
        ora_df = con.execute(sql).df()
        a, b = canon(spark_df), canon(ora_df)
        ok = a == b
        if not ok:
            fails += 1
            print(f"FAIL {name}: spark={len(a)} oracle={len(b)}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}:\n   spark:  {x}\n   oracle: {y}")
                    break
            if len(a) != len(b):
                print(f"  row count mismatch")
        else:
            print(f"ok   {name} ({len(a)} rows)")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {e}")
print(f"\n{fails} failures")
