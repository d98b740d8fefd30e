"""functions/mathfn.det_ln_sql: cross-engine deterministic ln."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

from financial_anomaly_detection_spark.functions.mathfn import det_ln_sql


def _values():
    vals = [2.0**e for e in range(-39, 40, 3)]
    vals += [1e-9, 1e-6, 0.001, 0.5, 0.999, 1.0, 1.0001, 2.0, math.e,
             math.pi, 10.0, 123.456, 9999.25, 1e7, 1e11]
    vals += [i / 97 + 1e-6 for i in range(1, 200)]
    return vals


def test_det_ln_bit_identical_across_engines_and_accurate(spark):
    vals = _values()
    con = duckdb.connect()
    con.execute("CREATE TABLE v(r DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in vals])
    duck = dict(con.sql(f"SELECT r, {det_ln_sql('r')} AS l FROM v").fetchall())
    df = spark.createDataFrame([(v,) for v in vals], "r double").withColumn(
        "l", F.expr(det_ln_sql("r"))
    )
    sp = {row["r"]: row["l"] for row in df.collect()}
    for v in vals:
        # the whole point: BIT identity, not tolerance
        assert duck[v] == sp[v], f"engines disagree at {v}"
        assert abs(sp[v] - math.log(v)) < 2e-8, f"inaccurate at {v}"


def test_det_ln_exact_at_powers_of_two(spark):
    # at r = 2^k the series term is ln(1) = 0 exactly; result is
    # k * LN2_literal — deterministic simple product
    df = spark.createDataFrame([(4.0,), (0.25,), (1.0,)], "r double").withColumn(
        "l", F.expr(det_ln_sql("r"))
    )
    got = {row["r"]: row["l"] for row in df.collect()}
    assert got[1.0] == 0.0
    assert got[4.0] == 2 * 0.6931471805599453
    assert got[0.25] == -2 * 0.6931471805599453
