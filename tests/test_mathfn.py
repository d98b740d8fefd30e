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


def test_det_exp_bit_identical_across_engines_and_accurate(spark):
    from financial_anomaly_detection_spark.functions.mathfn import det_exp_sql

    vals = [x / 7.3 for x in range(-280, 281, 7)]
    vals += [0.0, 1.0, -1.0, 39.9, -39.9, 1e-12, -1e-12]
    con = duckdb.connect()
    con.execute("CREATE TABLE v(x DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in vals])
    duck = dict(con.sql(f"SELECT x, {det_exp_sql('x')} AS e FROM v").fetchall())
    df = spark.createDataFrame([(v,) for v in vals], "x double").withColumn(
        "e", F.expr(det_exp_sql("x"))
    )
    sp = {row["x"]: row["e"] for row in df.collect()}
    for v in vals:
        assert duck[v] == sp[v], f"engines disagree at {v}"
        assert abs(sp[v] - math.exp(v)) / math.exp(v) < 1e-13, f"inaccurate at {v}"


def test_det_literals_are_double_typed_in_spark(spark):
    # the decimal-literal parser trap (a BIGINT floor times a DECIMAL
    # literal stays exact-decimal and diverges ~1e-12): every fragment
    # must evaluate as pure DOUBLE
    from financial_anomaly_detection_spark.functions.mathfn import (
        det_exp_sql,
        det_ln_sql,
    )

    df = spark.createDataFrame([(3.7,)], "x double")
    row = df.selectExpr(
        f"typeof({det_ln_sql('x')}) AS tl",
        f"typeof({det_exp_sql('x')}) AS te",
    ).collect()[0]
    assert row["tl"] == "double" and row["te"] == "double"


def test_det_ln_col_bit_identical_to_sql_form(spark):
    # round-12 Column twin: same IEEE op sequence, compact (let-bound)
    # tree. Must be BIT-identical to the SQL-string form over the full
    # grid, including a dense sweep across ladder-branch boundaries.
    from financial_anomaly_detection_spark.functions.mathfn import det_ln_col

    vals = _values()
    vals += [2.0**e * (1 + eps) for e in range(-40, 41, 1)
             for eps in (-1e-16, 0.0, 1e-16, 0.3)]
    vals = [v for v in vals if v > 0]
    df = spark.createDataFrame([(v,) for v in vals], "r double").select(
        "r",
        F.expr(det_ln_sql("r")).alias("sql_form"),
        det_ln_col(F.col("r")).alias("col_form"),
    )
    for row in df.collect():
        assert row["sql_form"] == row["col_form"], f"diverge at {row['r']}"


def test_det_exp_col_bit_identical_to_sql_form(spark):
    from financial_anomaly_detection_spark.functions.mathfn import (
        det_exp_col,
        det_exp_sql,
    )

    vals = [x / 7.3 for x in range(-280, 281, 7)]
    vals += [0.0, 1.0, -1.0, 39.9, -39.9, 1e-12, -1e-12]
    # k-boundary sweep: the pow-clamp must match the CASE ladder at
    # every integer k in and beyond the ladder range
    vals += [k * math.log(2) + d for k in range(-60, 61, 5)
             for d in (-0.2, 0.0, 0.2)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x",
        F.expr(det_exp_sql("x")).alias("sql_form"),
        det_exp_col(F.col("x")).alias("col_form"),
    )
    for row in df.collect():
        assert row["sql_form"] == row["col_form"], f"diverge at {row['x']}"
