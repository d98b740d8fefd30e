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
    return v


def canonical_frame(rows, cols):
    """The driver's canonicalization path: pandas sort_values over the
    whole result frame. This RAISES on array/map/struct cells exactly
    like the real driver did in r7 (TypeError: unhashable type) — the
    previous repr-sort silently accepted them, which is how the four
    multimodal queries shipped red."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(cols))
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def value_hash(rows, cols):
    pdf = canonical_frame(rows, cols)
    h = hashlib.md5()
    for r in pdf.itertuples(index=False, name=None):
        h.update(repr(tuple(norm(v) for v in r)).encode())
    return h.hexdigest()


_COMPLEX_TYPES = ("ArrayType", "MapType", "StructType")

qs, oracles = mod.queries(), mod.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF)
    # Schema-level guard, independent of canonical_frame's raise: a
    # SINGLE-column frame takes pandas' comparison-based argsort where
    # Python-list cells ARE orderable, so a one-column array output
    # would pass sort_values here yet still break the real driver.
    bad = [
        f.name for f in sdf.schema.fields
        if type(f.dataType).__name__ in _COMPLEX_TYPES
    ]
    assert not bad, (
        f"{name}: complex-typed driver-facing columns {bad} — project "
        "to scalars (quantized md5 + element aggregates)"
    )
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    if name not in oracles:
        # rows-only results still pass through the driver's pandas
        # canonicalizer — run it so array-cell outputs error here too
        canonical_frame(s_rows, s_cols)
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
