"""Mergeable frequency sketches (Count-Min) as relational plans.

Companion to the HLL tier (``approx_distinct_users`` uses Spark's
built-in approx_count_distinct): a Count-Min sketch (Cormode &
Muthukrishnan 2005) folds an unbounded key stream into a FIXED
``depth × width`` counter grid — the mergeable summary you ship from
1000 executors when the key cardinality itself is the scale problem
(per-key exact state is O(keys); the sketch is O(d·w) per partition,
merged by plain addition).

Engine form: hashing is md5-derived (identical bytes → identical
hex in every engine — the repo's hash-surrogate discipline, see
minhash_exact_md5), the grid is one ``groupBy(row, bucket)`` partial
aggregation (map-side combine does the per-partition sketching), and
point estimates are a ``min`` over the key's ``depth`` cells after a
broadcast-size equi-join against the grid. No UDFs, no driver state.

Estimates are upper bounds: cnt(k) <= est(k) <= cnt(k) + eps·N with
eps = e/width at the usual guarantees; both properties are
pytest-asserted and the grid itself is hash-exact against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(col, j: int, width: int):
    """Row-j bucket of a key: first 8 md5 hex chars as uint32, mod
    width. Bit-identical in any engine with md5 over the same bytes."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{j}"))), 1, 8), 16, 10)
        .cast("long")
        % width
    )


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the CMS grid: one row per (sketch row j, bucket) with the
    summed count. Exactly ONE shuffle of at most depth*width rows
    after map-side partial aggregation — the 100 TB shape."""
    key = F.col(key_col).cast("string")
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _bucket(key, j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_c"))
        .groupBy(F.col("_c.j").alias("j"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key in ``keys`` from the grid: min over its
    depth cells. The grid is depth*width rows — broadcast it."""
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _bucket(key, j, width).alias("bucket"))
            for j in range(depth)
        ]
    )
    probes = keys.select(F.col(key_col), F.explode(cells).alias("_c")).select(
        key_col, F.col("_c.j").alias("j"), F.col("_c.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )
