"""Simulate the spark-graft driver against /root/repo/__spark_entry__.py.

Builds a VANILLA SparkSession (no engine configs — the entry module must
self-configure), runs entry(spark) smoke, then every queries()[k] at sf0.01
compared against oracle_sql()[k] via DuckDB (row count + column names +
order-insensitive values).
"""
import math, sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
import duckdb

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver_sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# --- smoke ---
rows = e.entry(spark).collect()
print(f"SMOKE entry(): {len(rows)} rows; schema={e.entry(spark).schema.simpleString()}")
assert len(rows) > 0

# --- t2 oracle compare at sf0.01 ---
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if v is None: return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)): return tuple(canon(x) for x in v)
    if isinstance(v, bytes): return v.hex()
    return v

qs, os_ = e.queries(), e.oracle_sql()
fails = []
for k in sorted(qs):
    df = qs[k](spark, SF)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    if k not in os_:
        print(f"ROWS  {k}: {len(srows)} rows (no oracle)")
        continue
    res = con.execute(os_[k])
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    ok_cols = sorted(scols) == sorted(dcols)
    ok_n = len(srows) == len(drows)
    order = lambda cols: sorted(range(len(cols)), key=lambda i: cols[i])
    so, do = order(scols), order(dcols)
    sset = sorted([tuple(canon(r[i]) for i in so) for r in srows], key=repr)
    dset = sorted([tuple(canon(r[i]) for i in do) for r in drows], key=repr)
    ok_vals = sset == dset
    status = "OK" if (ok_cols and ok_n and ok_vals) else "MISMATCH"
    print(f"HASH  {k}: {status} rows={len(srows)}/{len(drows)} cols_ok={ok_cols} vals_ok={ok_vals}")
    if status != "OK":
        fails.append(k)
        for a, b in list(zip(sset, dset))[:3]:
            if a != b: print("   spark:", a, "\n   duck :", b)

print("RESULT:", "PASS" if not fails else f"FAIL {fails}")
sys.exit(1 if fails else 0)
