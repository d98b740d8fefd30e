"""Differential test: every registered query vs its DuckDB oracle.

This is a local replica of the driver's correctness gate
(CORRECTNESS_r{N}.json): row count + schema + order-insensitive exact
values at the test scale factor.
"""

from __future__ import annotations

import pytest

from financial_anomaly_detection_spark.queries import REGISTRY
from tests.oracle_harness import compare, duck_connection

ORACLE_QUERIES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_QUERIES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    res = compare(df, duck, spec.oracle)
    assert res["rowcount_match"], f"{name}: rows {res['spark_rows']} != {res['oracle_rows']}"
    assert res["schema_match"], f"{name}: cols {res['spark_cols']} != {res['oracle_cols']}"
    assert res["values_match"], f"{name}: first diff {res['first_diff']}"
    # a 0-row agreement is vacuous evidence — every query must exercise
    # real rows at every scale factor (caught twice: anti-join, near-dup)
    assert res["spark_rows"] > 0, f"{name}: query returns no rows at this sf"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
