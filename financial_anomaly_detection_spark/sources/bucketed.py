"""Storage-level bucketing for shuffle-free co-located joins.

At 100 TB the single most expensive repeated cost is re-shuffling the
fact table on the same join key for every downstream job (events by
``user_id``: profile builds, deviation joins, sessionization all key on
it). Spark's storage-level answer is bucketed tables: data is written
pre-hash-partitioned (and optionally pre-sorted) into a fixed number of
buckets, and every later equi-join or aggregation on the bucket key
reads the co-located layout instead of exchanging — the plan contains
NO Exchange on either bucketed side (asserted by
``tests/test_bucketed.py``).

Design notes for the 100 TB target:

* Bucket counts should be set once per table from target file sizes
  (total size / ~256 MB), and must MATCH across tables that join
  (Spark only elides both exchanges when bucket counts are equal;
  with unequal counts set ``spark.sql.bucketing.coalesceBucketsInJoin.
  enabled`` to coalesce the larger side).
* ``sortBy`` the bucket key so sort-merge joins also skip the sort.
* Writes go through ``saveAsTable`` (bucket metadata lives in the
  catalog — a plain ``parquet(path)`` write silently drops it); the
  ``path`` option keeps the data at an explicit location, so the
  catalog entry is just metadata.
* This complements (not replaces) AQE: bucketing removes the shuffle
  for the planned keys; AQE still handles skew inside the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet table."""
    writer = df.write.format("parquet").mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table via the catalog (the only route that
    preserves the bucketing metadata for exchange elimination)."""
    return spark.table(table)
