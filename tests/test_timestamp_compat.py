"""Timestamp physical-type compatibility of the parquet read path.

The driver regenerates testdata between rounds and has already shipped
two different timestamp encodings (TIMESTAMP(NANOS) in rounds 1-2,
timestamp[us] with isAdjustedToUTC=false — Spark 4's TIMESTAMP_NTZ —
in round 3). ``load_table`` must normalize every variant to a plain
session-local TIMESTAMP with identical epoch values, or time
arithmetic (unix_micros, RANGE frames) breaks under the driver's plain
SparkSession.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from financial_anomaly_detection_spark.sources.readers import load_table

TS = [
    datetime.datetime(2025, 5, 1, 2, 0, 0),
    datetime.datetime(2025, 5, 1, 2, 30, 59, 123456),
    datetime.datetime(2026, 1, 1, 0, 0, 0),
]
EPOCH_US = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for t in TS]


def _write(tmp_path, name, arrow_type):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, arrow_type),
        }
    )
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("us"),             # naive -> Spark 4 TIMESTAMP_NTZ (round 3)
        pa.timestamp("us", tz="UTC"),   # UTC-adjusted -> TIMESTAMP (round 1 era)
        pa.timestamp("ns"),             # NANOS -> nanosAsLong legacy path
    ],
    ids=["ntz-us", "utc-us", "nanos"],
)
def test_load_table_normalizes_timestamp_type(spark, tmp_path, arrow_type):
    sf_dir = _write(tmp_path, "sf-test", arrow_type)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp", (
        f"{arrow_type}: got {df.schema['ts'].dataType}"
    )
    # unix_micros must resolve AND yield the same epoch for every encoding
    rows = df.select("event_id", F.unix_micros("ts").alias("us")).orderBy(
        "event_id"
    ).collect()
    assert [r["us"] for r in rows] == EPOCH_US
