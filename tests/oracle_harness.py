"""Local mirror of the driver's DuckDB differential-correctness gate.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and values
order-insensitively. Values must match EXACTLY after the query's own
rounding discipline — the driver hashes values, so a tolerance-based
pass locally would still fail the real gate.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from financial_anomaly_detection_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: the queries round explicitly, so equal
        # values stringify identically; this only collapses -0.0/0.0.
        return repr(v + 0.0)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def driver_canonicalize(rows, colnames):
    """Reproduce the REAL driver's canonicalization: a pandas frame
    sorted with ``sort_values`` over every column.

    Round-7 lesson (CORRECTNESS_r07): our repr-based sort accepted
    array-typed cells that the driver's pandas path cannot order
    (``TypeError: unhashable type: 'numpy.ndarray'``), so four
    multimodal queries shipped driver-red despite a green local sim.
    Any query output with array/map/struct cells must raise HERE,
    locally, first.
    """
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(colnames))
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


_COMPLEX_TYPE_NAMES = ("ArrayType", "MapType", "StructType")


def assert_canonicalizer_safe(df, name: str, rows=None):
    """Fail if a driver-facing output would break the driver's pandas
    canonicalizer: complex-typed top-level columns, or cells the
    sort_values path cannot order."""
    bad = [
        f.name
        for f in df.schema.fields
        if type(f.dataType).__name__ in _COMPLEX_TYPE_NAMES
    ]
    assert not bad, (
        f"{name}: driver-facing output has complex-typed columns {bad} — "
        "the driver's pandas sort_values canonicalizer cannot order "
        "array/map/struct cells (r7: multimodal_*_features). Project to "
        "scalars (quantized md5 + element aggregates)."
    )
    if rows is not None:
        driver_canonicalize([tuple(r) for r in rows], df.columns)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = [str(t).upper() for t in rel.types]
    d_rows = rel.fetchall()

    # The driver hashes typed values, so a DuckDB HUGEINT (e.g. an
    # un-cast SUM(BIGINT)) or DECIMAL column hash-mismatches a Spark
    # bigint even when every value is equal (caught once in r4:
    # mad_robust_outliers). Flag these type-level artifacts locally.
    type_flags = [
        (c, t)
        for c, t in zip(d_cols, d_types)
        if t in ("HUGEINT", "UHUGEINT", "INT128") or t.startswith("DECIMAL")
    ]

    result = {
        "type_flags": type_flags,
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(d_cols),
        "rowcount_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "values_match": False,
        "first_diff": None,
    }
    if not (result["rowcount_match"] and result["schema_match"]):
        return result

    sc = _canon(s_rows, s_cols)
    dc = _canon(d_rows, d_cols)
    result["values_match"] = sc == dc
    if not result["values_match"]:
        for i, (a, b) in enumerate(zip(sc, dc)):
            if a != b:
                result["first_diff"] = {"row": i, "spark": a, "oracle": b}
                break
        else:
            result["first_diff"] = {"row": min(len(sc), len(dc)), "note": "length"}
    return result
