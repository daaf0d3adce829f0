"""Simulate the spark-graft driver: import __spark_entry__, run entry() +
every queries()[name] at sf0.01, compare to oracle_sql()[name] via DuckDB
using an order-insensitive value hash. Deliberately builds a VANILLA
SparkSession with a hostile timezone (Asia/Shanghai) and 200 shuffle
partitions — the engine's tune() must override both or hashes diverge."""

import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

# Default mirrors the driver's correctness SF; override to stress the
# oracles at 10x (SIM_SF_DIR=/root/testdata/sf0.1).
SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.session.timeZone", "Asia/Shanghai")  # hostile
    .config("spark.sql.shuffle.partitions", "200")  # hostile default
    # heap is NOT part of the hostile contract (tune() cannot change it
    # post-JVM-start); default mirrors the driver, raise for sf0.1 stress
    .config("spark.driver.memory", os.environ.get("SIM_DRIVER_MEM", "1g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

# --- smoke: entry() ---
df = entrymod.entry(spark)
n = df.count()
schema1 = df.schema.simpleString()
df2 = entrymod.entry(spark)
schema2 = df2.schema.simpleString()
print(f"entry(): rows={n} stable_schema={schema1 == schema2}")
assert n > 0 and schema1 == schema2

# --- correctness: queries vs oracles ---
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64").map(lambda v: f"{v:.10g}")
        else:
            pdf[c] = pdf[c].astype("string")
    rows = sorted("\x1f".join("" if pd.isna(v) else str(v) for v in r)
                  for r in pdf.itertuples(index=False))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


qs = entrymod.queries()
oracles = entrymod.oracle_sql()
# --only name1,name2 verifies a subset (fast iteration); default = all.
only = None
for i, a in enumerate(sys.argv):
    if a == "--only" and i + 1 < len(sys.argv):
        only = set(sys.argv[i + 1].split(","))
if only:
    missing = only - set(qs)
    assert not missing, f"--only names not in registry: {missing}"
    qs = {k: v for k, v in qs.items() if k in only}
fails = []
for name in sorted(qs):
    sdf = qs[name](spark, SF)
    spdf = sdf.toPandas()
    if name not in oracles:
        print(f"{name}: rows-only rows={len(spdf)}")
        continue
    opdf = con.execute(oracles[name]).df()
    h1, h2 = value_hash(spdf), value_hash(opdf)
    ok = h1 == h2 and len(spdf) == len(opdf)
    print(f"{name}: rows={len(spdf)}/{len(opdf)} hash={'MATCH' if ok else 'MISMATCH ' + h1 + ' vs ' + h2}")
    if not ok:
        fails.append(name)

print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
