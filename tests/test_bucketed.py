"""Storage-level bucketing: co-located joins have NO Exchange.

The 100 TB claim in sources/bucketed.py, verified on the physical
plan: two tables bucketed (and sorted) on the same key with the same
bucket count sort-merge-join with zero Exchange and zero Sort nodes,
and a groupBy on the bucket key aggregates without a shuffle.
"""

from __future__ import annotations

import pytest

from financial_anomaly_detection_spark.queries import load_table
from financial_anomaly_detection_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_events")
    )
    write_bucketed(ev, "ev_bucketed", "user_id", 8, path=str(base / "ev"))
    write_bucketed(cust, "cust_bucketed", "user_id", 8, path=str(base / "cust"))
    yield "ev_bucketed", "cust_bucketed"
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS cust_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ev_t, cust_t = bucketed_tables
    ev = read_bucketed(spark, ev_t)
    cust = read_bucketed(spark, cust_t)
    # force the SMJ path: broadcast would hide the co-location
    joined = ev.hint("merge").join(cust, "user_id")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == ev.count()


def test_bucketed_group_by_has_no_exchange(spark, bucketed_tables):
    ev_t, _ = bucketed_tables
    ev = read_bucketed(spark, ev_t)
    agg = ev.groupBy("user_id").sum("value")
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() > 0


def test_unbucketed_join_needs_exchange(spark, sf_dir):
    # control: the same join from plain parquet DOES shuffle — the
    # bucketed layout, not the data, is what removed the Exchange.
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = ev.groupBy("user_id").count()
    joined = ev.hint("merge").join(cust, "user_id")
    assert "Exchange" in _plan(joined)


def test_bucketed_join_matches_unbucketed_values(spark, sf_dir, bucketed_tables):
    ev_t, cust_t = bucketed_tables
    bucketed = (
        read_bucketed(spark, ev_t)
        .hint("merge")
        .join(read_bucketed(spark, cust_t), "user_id")
        .groupBy()
        .sum("n_events")
        .first()[0]
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")
    plain = ev.join(cust, "user_id").groupBy().sum("n_events").first()[0]
    assert bucketed == plain
