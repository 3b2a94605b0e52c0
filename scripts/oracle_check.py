"""Driver-gate simulation: every queries() entry vs its oracle_sql() in DuckDB.

Usage: python scripts/oracle_check.py [sf_dir] [only,names]
Defaults to /root/testdata/sf0.01 — the drivers gate scale.
"""
import sys, hashlib, importlib.util, time
import duckdb
import pandas as pd
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "6g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(list(df.columns), ignore_index=True)

def vhash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        if col.dtype == np.float64 or col.dtype == np.float32:
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col.astype(str), index=False).values.tobytes())
    return h.hexdigest()

qs = entry.queries()
oracles = entry.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR).toPandas()
    except Exception as e:
        fails.append((name, f"SPARK ERR {e}"))
        print(f"{name:28s} SPARK-ERROR {e}")
        continue
    if name not in oracles:
        print(f"{name:28s} no_oracle rows={len(sdf)} ({time.time()-t0:.1f}s)")
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"ORACLE ERR {e}"))
        print(f"{name:28s} ORACLE-ERROR {e}")
        continue
    s, o = norm(sdf), norm(odf)
    rows_ok = len(s) == len(o)
    cols_ok = list(s.columns) == list(o.columns)
    hash_ok = rows_ok and cols_ok and vhash(s) == vhash(o)
    status = "OK" if hash_ok else "MISMATCH"
    if not hash_ok:
        fails.append((name, f"rows {len(s)}vs{len(o)} cols_ok={cols_ok}"))
    print(f"{name:28s} {status} rows={len(s)} ({time.time()-t0:.1f}s)")

print(f"\n{len(fails)} failures")
for n, e in fails:
    print(" -", n, e)
