"""Fully-distributed LOF via LSH candidate generation (SURVEY.md §2.7
M6 "hardest at scale" + §7 hard-problem #1).

``ml.lof.LOFNoveltyModel`` broadcasts a bounded reference sample —
right for serving, but capped. This variant computes LOF as a pure
composition of DataFrame operators, so BOTH sides scale out:

  1. ``approxSimilarityJoin`` (BucketedRandomProjectionLSH) generates
     candidate neighbor pairs bucket-locally (no cross join);
  2. a ranking window keeps each point's k nearest candidates;
  3. k-distance, reachability distance, lrd, and the final LOF ratio
     are grouped aggregations + self-joins on point ids.

Approximation: neighbors missed by LSH inflate distances slightly;
tests assert ranking quality (planted anomalies on top), not value
parity with the exact form. Reference semantics per Breunig et al.
2000 (public).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window, functions as F


def distributed_lof(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_neighbors: int = 20,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    max_distance: float = 1e9,
    seed: int = 42,
) -> DataFrame:
    """LOF score for every row of ``df`` against ``df`` itself
    (outlier-detection mode). Returns (id, lof)."""
    pts = df.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(pts)
    # candidate pairs from shared buckets; keep k nearest per point
    joined = model.approxSimilarityJoin(pts, pts, max_distance, distCol="_d").select(
        F.col("datasetA._id").alias("a"),
        F.col("datasetB._id").alias("b"),
        "_d",
    ).filter(F.col("a") != F.col("b"))
    w = Window.partitionBy("a").orderBy("_d", "b")
    knn = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= n_neighbors
    )

    # k-distance of each point = distance to its k-th kept neighbor
    kdist = knn.groupBy("a").agg(F.max("_d").alias("_kdist"))

    # reach_dist_k(a, b) = max(kdist(b), d(a, b))
    reach = (
        knn.join(kdist.select(F.col("a").alias("b"), F.col("_kdist").alias("_kdist_b")), "b")
        .withColumn("_reach", F.greatest("_kdist_b", "_d"))
    )
    # lrd(a) = |kNN(a)| / sum(reach)
    lrd = reach.groupBy("a").agg(
        (F.count(F.lit(1)) / F.sum("_reach")).alias("_lrd")
    )
    # LOF(a) = mean(lrd(b) for b in kNN(a)) / lrd(a)
    neigh_lrd = knn.join(
        lrd.select(F.col("a").alias("b"), F.col("_lrd").alias("_lrd_b")), "b"
    ).groupBy("a").agg(F.avg("_lrd_b").alias("_mean_lrd_b"))
    out = neigh_lrd.join(lrd, "a").select(
        F.col("a").alias(id_col),
        (F.col("_mean_lrd_b") / F.col("_lrd")).alias("lof"),
    )
    return out
