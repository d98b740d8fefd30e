"""Overflow-boundary tests for the drift-statistic cores.

The KS / Mann-Whitney queries reduce the scan to a per-value count
table, so 100 TB-scale windows are reproducible HERE by feeding the
count-table cores (operators/driftstats.py) synthetic rows whose
COUNTS are in the billions — no data volume needed. Each case is
checked against a pure-Python big-int oracle (Python ints don't
overflow), proving the DECIMAL(38,0) path computes the exact integer
semantics at scales where the old int64 products would have thrown
ARITHMETIC_OVERFLOW under ANSI mode (rank*n ~ 2.5e19 > 2^63).

Small-count agreement (the "int64 branch" semantics) is covered by
the same oracle at tiny counts plus the sf0.001/sf0.01 DuckDB
differential in test_queries_oracle.py — one arithmetic, two scales.
"""

from __future__ import annotations

from financial_anomaly_detection_spark.operators.driftstats import (
    ks_from_counts,
    mannwhitney_from_counts,
)


def _py_ks(rows):
    # rows: [(cents, c_ref, c_cur)] — exact big-int KS
    rows = sorted(rows)
    n_ref = sum(r[1] for r in rows)
    n_cur = sum(r[2] for r in rows)
    r_ref = r_cur = 0
    d_num = 0
    for _, cr, cc in rows:
        r_ref += cr
        r_cur += cc
        d_num = max(d_num, abs(r_ref * n_cur - r_cur * n_ref))
    d_u = None if n_ref * n_cur == 0 else (d_num * 10**6) // (n_ref * n_cur)
    return n_ref, n_cur, d_num, d_u


def _py_mw(rows):
    # rows: [(cents, c_ref, t)] — exact big-int doubled-midrank U
    rows = sorted(rows)
    n_ref = sum(r[1] for r in rows)
    n_all = sum(r[2] for r in rows)
    n_cur = n_all - n_ref
    r_before = 0
    r2 = 0
    for _, cr, t in rows:
        r2 += cr * (2 * r_before + t + 1)
        r_before += t
    u2 = r2 - n_ref * (n_ref + 1)
    auc = None if n_ref * n_cur == 0 else (u2 * 10**6) // (2 * n_ref * n_cur)
    return n_ref, n_cur, u2, auc


def _ks_case(spark, rows):
    g = spark.createDataFrame(rows, "cents long, c_ref long, c_cur long")
    got = ks_from_counts(g).collect()[0]
    assert tuple(got) == _py_ks(rows)


def _mw_case(spark, rows):
    g = spark.createDataFrame(rows, "cents long, c_ref long, t long")
    got = mannwhitney_from_counts(g).collect()[0]
    assert tuple(got) == _py_mw(rows)


def test_ks_small_counts_match_bigint_oracle(spark):
    _ks_case(spark, [(10, 3, 1), (20, 2, 5), (30, 0, 4), (40, 7, 2)])


def test_ks_billion_scale_counts(spark):
    # n_ref = n_cur = 5e9: rank*n products reach ~2.5e19 (> 2^63 —
    # the old int64 gap would overflow under ANSI); the max rank
    # divergence is ~1e8 so d_num ~ 5e17 still fits the BIGINT
    # output column, as documented.
    rows = [
        (1, 2_000_000_000, 1_900_000_000),
        (2, 1_500_000_000, 1_550_000_000),
        (3, 1_000_000_000, 1_050_000_000),
        (4, 500_000_000, 500_000_000),
    ]
    assert sum(r[1] for r in rows) == sum(r[2] for r in rows) == 5_000_000_000
    _ks_case(spark, rows)


def test_ks_empty_window_degrades_to_null(spark):
    rows = [(1, 0, 4_000_000_000), (2, 0, 3_000_000_000)]
    g = spark.createDataFrame(rows, "cents long, c_ref long, c_cur long")
    got = ks_from_counts(g).collect()[0]
    assert got["n_ref"] == 0 and got["d_u"] is None


def test_mw_small_counts_match_bigint_oracle(spark):
    _mw_case(spark, [(10, 3, 5), (20, 2, 6), (30, 0, 4), (40, 1, 3)])


def test_mw_billion_scale_counts(spark):
    # n_ref = 4e9 (low values) vs n_cur = 1e6 (high values, slight
    # overlap): r2_ref ~ n_ref^2 ~ 1.6e19 (> 2^63 — the old int64
    # SUM(c_ref * midrank2) would overflow) while u2_ref <=
    # 2*n_ref*n_cur = 8e15 fits the BIGINT output.
    rows = [
        (1, 2_000_000_000, 2_000_000_000),
        (2, 1_999_000_000, 1_999_400_000),
        (3, 1_000_000, 1_400_000),  # overlap band
        (4, 0, 200_000),
    ]
    assert sum(r[1] for r in rows) == 4_000_000_000
    assert sum(r[2] for r in rows) - sum(r[1] for r in rows) == 1_000_000
    _mw_case(spark, rows)


def test_mw_empty_window_degrades_to_null(spark):
    rows = [(1, 0, 4_000_000_000)]
    g = spark.createDataFrame(rows, "cents long, c_ref long, t long")
    got = mannwhitney_from_counts(g).collect()[0]
    assert got["n_ref"] == 0 and got["auc_u"] is None
