"""Storage-layout tests backing the SCALING.md claims: date-partitioned
writes give partition-pruned reads, and bucketed tables delete the
join shuffle (the 100 TB co-location strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_anomaly_detection_spark.sources.readers import load_table


def test_date_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).parquet(out)

    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the day filter must be a partition filter on the scan, not a data filter
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan.split("PartitionFilters")[1].split("]")[0]
    # and it returns exactly that day's rows
    days = {str(r["day"]) for r in back.select("day").distinct().collect()}
    assert days == {"2024-01-05"}  # read back as DATE (partition type inference)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key removes the Exchange:
    SortMergeJoin reads pre-bucketed data directly (SCALING.md 'bucket
    both fact tables on orderkey to delete that shuffle')."""
    # (warehouse dir is a static conf — tables land in the default
    # spark-warehouse and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
            "li_bucketed"
        )
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
            "o_bucketed"
        )
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle on either side: bucketed scans are pre-partitioned
        assert "Exchange hashpartitioning" not in plan
        # sanity: result matches the unbucketed join
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_salted_aggregation_matches_unsalted(spark, sf_dir):
    """SCALING.md skew strategy: two-phase salted aggregation (partial
    per (key, salt), re-aggregated per key) must reproduce the plain
    groupBy exactly — integer-cents partials compose without float
    drift."""
    from financial_anomaly_detection_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")

    plain = ev.groupBy("event_type").agg(
        F.sum(cents).alias("total_cents"), F.count(F.lit(1)).alias("n")
    )
    salted = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "_salt")
        .agg(F.sum(cents).alias("_pc"), F.count(F.lit(1)).alias("_pn"))
        .groupBy("event_type")
        .agg(F.sum("_pc").alias("total_cents"), F.sum("_pn").alias("n"))
    )
    a = {r["event_type"]: (r["total_cents"], r["n"]) for r in plain.collect()}
    b = {r["event_type"]: (r["total_cents"], r["n"]) for r in salted.collect()}
    assert a == b
