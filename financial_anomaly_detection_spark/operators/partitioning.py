"""Partition-layout helpers for Python-kernel stages.

Arrow ``pandas_udf`` / ``mapInPandas`` stages inherit the input's
partitioning, and a small parquet table arrives as ONE file partition —
which silently serializes a decode or scoring kernel onto one core
while the other 31 idle. ``spread_narrow`` widens such inputs to the
cluster's default parallelism before the Python stage; at real scale
the scan is already wide and this is a no-op (no exchange added).

This is the repartition the multimodal module's design notes call for
("decode as a mapInPandas stage after a repartition sized so one Arrow
batch of payloads fits executor memory") — centralized so every
Python-kernel call site applies it consistently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame) -> DataFrame:
    """Repartition a batch DataFrame up to ``defaultParallelism`` if it
    has fewer partitions; pass streaming frames through untouched
    (micro-batch partitioning is the source's concern, and a streaming
    plan cannot be probed via ``.rdd``)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
