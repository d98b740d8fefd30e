"""Simulate the driver harness: plain SparkSession (none of the engine's
confs pre-set), import __spark_entry__ by path, smoke entry(), then run
every queries() entry vs oracle_sql() via DuckDB with a value-hash compare."""
import hashlib
import importlib.util
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Driver-style plain session: NO engine confs.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

sys.path.insert(0, "/root/repo")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

# --- smoke ---
df = mod.entry(spark)
n = df.count()
print(f"SMOKE entry(): rows={n} schema={[f'{f.name}:{f.dataType.simpleString()}' for f in df.schema.fields]}")
assert n > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v + 0.0)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted([tuple(norm(r[i]) for i in order) for r in rows], key=repr)
    h = hashlib.md5()
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest()


qs, oracles = mod.queries(), mod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    if name not in oracles:
        print(f"ROWSONLY {name}: rows={len(s_rows)}")
        continue
    rel = con.sql(oracles[name])
    d_rows, d_cols = rel.fetchall(), list(rel.columns)
    sh, dh = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
    ok = (len(s_rows) == len(d_rows)) and (sorted(s_cols) == sorted(d_cols)) and (sh == dh)
    print(f"{'MATCH' if ok else 'MISMATCH'} {name}: rows {len(s_rows)}/{len(d_rows)} hash {sh[:8]}/{dh[:8]}")
    if not ok:
        fails += 1
print(f"RESULT: {'ALL MATCH' if fails == 0 else f'{fails} MISMATCHES'}")
spark.stop()
