"""Simulate the spark-graft driver against /root/repo/__spark_entry__.py.

Builds a VANILLA SparkSession (no engine configs — the entry module must
self-configure), runs entry(spark) smoke, then every queries()[k] at sf0.01
compared against oracle_sql()[k] via DuckDB.

REPRESENTATION-STRICT (round 3): the compare mirrors the driver's pandas
canonicalizer rather than a lenient tuple compare —
  * both results go through pandas (toPandas / fetchdf) and dtype KINDS must
    match column-by-column (catches DuckDB HUGEINT -> float64 vs Spark int64);
  * any list/tuple/ndarray/dict cell is an immediate representation error
    (the driver's hasher crashes on these — d8 in rounds 1-2);
  * floats canonicalize via repr(round(v, 9)), which distinguishes -0.0 from
    +0.0 exactly like a byte-level hash would (d6 in rounds 1-2).

Usage:
  python tools/driver_sim.py [sf_dir] [--json OUT.json] [--keys k1,k2,...]
                             [--sample N --seed R]

--sample N --seed R soaks a random N-key subset drawn with seed R (use the
round number): the real driver samples a FIXED 50-key prefix (a-d + q3),
so refactors to the e-o families could otherwise dodge the per-round
check — rotate the seed each round and no family stays unsampled for long
(VERDICT round-5 item 7).
"""

import json
import math
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
from pyspark.sql import SparkSession

args = [a for a in sys.argv[1:]]
json_out = None
only_keys = None
if "--json" in args:
    i = args.index("--json")
    json_out = args[i + 1]
    del args[i : i + 2]
if "--keys" in args:
    i = args.index("--keys")
    only_keys = set(args[i + 1].split(","))
    del args[i : i + 2]
sample_n = sample_seed = None
if "--sample" in args:
    i = args.index("--sample")
    sample_n = int(args[i + 1])
    del args[i : i + 2]
if "--seed" in args:
    i = args.index("--seed")
    sample_seed = int(args[i + 1])
    del args[i : i + 2]
SF = args[0] if args else "/root/testdata/sf0.01"

if sample_n is not None:
    if only_keys is not None:
        sys.exit("--sample and --keys are mutually exclusive")
    import __spark_entry__ as _e_keys

    universe = sorted(_e_keys.queries().keys())
    rng = random.Random(0 if sample_seed is None else sample_seed)
    only_keys = set(rng.sample(universe, min(sample_n, len(universe))))
    print(f"SAMPLE seed={sample_seed} n={len(only_keys)}: "
          f"{','.join(sorted(only_keys))}")

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

# --- t2 oracle compare ---
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


class RepresentationError(Exception):
    pass


def canon_cell(v, col, side):
    if v is None:
        return None
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise RepresentationError(
            f"{side}.{col} holds {type(v).__name__} — driver hasher crashes on this"
        )
    if isinstance(v, (np.floating, float)):
        v = float(v)
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_frame(pdf, side):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    out = []
    for _, row in pdf.iterrows():
        out.append(tuple(canon_cell(row[c], c, side) for c in cols))
    out.sort(key=repr)
    kinds = {c: pdf[c].dtype.kind for c in cols}
    return cols, kinds, out


qs, os_ = e.queries(), e.oracle_sql()
results = {}
fails = []
for k in sorted(qs):
    if only_keys and k not in only_keys:
        continue
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "dtype_match": None, "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sdf = qs[k](spark, SF).toPandas()
        rec["spark_rows"] = len(sdf)
        if k not in os_:
            print(f"ROWS  {k}: {len(sdf)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            rec["err"] = "no_oracle"
            results[k] = rec
            continue
        ddf = con.execute(os_[k]).fetchdf()
        rec["oracle_rows"] = len(ddf)
        scols, skinds, srows = canon_frame(sdf, f"spark:{k}")
        dcols, dkinds, drows = canon_frame(ddf, f"duck:{k}")
        rec["schema_match"] = scols == dcols
        rec["rows_match"] = len(srows) == len(drows)
        # dtype KIND compare (i/u int, f float, O object, b bool, M datetime)
        norm = lambda kind: {"u": "i"}.get(kind, kind)
        rec["dtype_match"] = rec["schema_match"] and all(
            norm(skinds[c]) == norm(dkinds[c]) for c in scols
        )
        rec["hash_match"] = srows == drows
        ok = all([rec["schema_match"], rec["rows_match"],
                  rec["dtype_match"], rec["hash_match"]])
        status = "OK" if ok else "MISMATCH"
        print(f"HASH  {k}: {status} rows={len(srows)}/{len(drows)} "
              f"cols_ok={rec['schema_match']} dtypes_ok={rec['dtype_match']} "
              f"vals_ok={rec['hash_match']}  [{time.time()-t0:.1f}s]")
        if not ok:
            fails.append(k)
            if not rec["dtype_match"]:
                print("   spark kinds:", skinds, "\n   duck  kinds:", dkinds)
            for a, b in list(zip(srows, drows))[:3]:
                if a != b:
                    print("   spark:", a, "\n   duck :", b)
    except RepresentationError as ex:
        rec["err"] = f"representation: {ex}"
        print(f"REPR  {k}: ERROR {ex}")
        fails.append(k)
    except Exception as ex:  # noqa: BLE001 — soak must keep going
        rec["err"] = f"{type(ex).__name__}: {ex}"
        print(f"ERR   {k}: {type(ex).__name__}: {ex}")
        fails.append(k)
    results[k] = rec

if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"wrote {json_out}")

print("RESULT:", "PASS" if not fails else f"FAIL {fails}")
sys.exit(1 if fails else 0)
