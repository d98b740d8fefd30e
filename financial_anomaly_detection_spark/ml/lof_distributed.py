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

import numpy as np
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, Window, functions as F


def estimate_distance_cutoff(
    df: DataFrame,
    vec_col: str = "embedding",
    n_neighbors: int = 20,
    sample_size: int = 1024,
    pct: float = 95.0,
    factor: float = 1.0,
    fanout_per_k: int = 4,
    n_total: int | None = None,
    seed: int = 42,
) -> float:
    """Sample-estimated candidate-distance cutoff, fan-out capped.

    Two estimates, take the smaller:

    1. the ``pct``-th percentile of the sampled k-NN distance × ``factor``
       (recall: admits each point's true k-NN for ~pct% of points);
    2. the pairwise-distance quantile at which the EXPECTED candidate
       count per point is ``fanout_per_k * n_neighbors`` (cost: caps the
       LSH join output even under high-dimensional distance
       concentration, where the gap between the k-NN distance and the
       median pair distance collapses and any padded cutoff admits
       nearly all n² pairs — measured: factor=2.0 on unit-norm 64-d
       vectors returned 1871 of 1999 possible candidates per point).

    Points whose true k-NN falls beyond the cutoff escalate to the
    wide phase-2 join in :func:`distributed_lof`, so tightening the
    cutoff trades phase-2 size, not correctness. Driver cost is
    O(sample_size²) on a Gram matrix (≤ ~8 MB), the same
    bounded-sample discipline as the scorers' fit pools.
    """
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("_x"))
        .filter(F.col("_x").isNotNull())
        .limit(sample_size)
        .collect()
    )
    X = np.array([r["_x"] for r in rows], dtype=np.float64)
    if len(X) < 2:
        return float("inf")
    sq = (X * X).sum(axis=1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0)
    k = min(n_neighbors, len(X) - 1)
    kth = np.sqrt(np.partition(d2, k, axis=1)[:, k])  # index 0 is self
    recall_cut = float(factor * np.percentile(kth, pct))

    if n_total is None:
        n_total = df.count()
    if n_total <= 1:
        return recall_cut
    target = min(float(fanout_per_k * n_neighbors), float(n_total - 1))
    d = np.sqrt(d2)
    np.fill_diagonal(d, np.inf)
    offdiag = d[np.isfinite(d)]
    cap_cut = float(np.quantile(offdiag, min(1.0, target / (n_total - 1))))
    return min(recall_cut, cap_cut)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_neighbors: int = 20,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    max_distance: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Candidate neighbor pairs (a, b, _d) from bucket-local LSH joins.

    ``max_distance=None`` estimates a cutoff from a bounded sample
    (see ``estimate_distance_cutoff``) instead of the old unbounded
    default, so bucket occupancy is no longer the only fan-out bound.
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    if max_distance is None:
        max_distance = estimate_distance_cutoff(
            df, vec_col=vec_col, n_neighbors=n_neighbors, seed=seed
        )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(pts)
    # pre-hash once; approxSimilarityJoin reuses the existing hash column
    hashed = model.transform(pts).localCheckpoint(eager=True)
    return (
        model.approxSimilarityJoin(hashed, hashed, max_distance, distCol="_d")
        .select(
            F.col("datasetA._id").alias("a"),
            F.col("datasetB._id").alias("b"),
            "_d",
        )
        .filter(F.col("a") != F.col("b"))
    )


def distributed_lof(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_neighbors: int = 20,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    max_distance: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """LOF score for every row of ``df`` against ``df`` itself
    (outlier-detection mode). Returns (id, lof).

    Candidate generation is two-phase: (1) a cutoff-bounded LSH join
    for the dense bulk, then (2) points left with fewer than
    ``n_neighbors`` candidates — isolated points and micro-clusters
    smaller than k, i.e. exactly the LOF-positive shapes the cutoff
    would otherwise blind — escalate to a wide join whose fan-out is
    bounded by bucket occupancy. The escalated set is small by
    construction (a dense corpus has few sparse points), so phase 2
    costs |sparse| x occupancy, not n x occupancy.
    """
    from ..operators.partitioning import spread_narrow

    df = spread_narrow(df)
    pts = df.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    if max_distance is None:
        max_distance = estimate_distance_cutoff(
            df, vec_col=vec_col, n_neighbors=n_neighbors, seed=seed
        )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(pts)
    # Pre-hash ONCE and pin: approxSimilarityJoin reuses an existing
    # hash column, so both phases probe the same materialized hashed
    # set instead of re-running the LSH projection per join side.
    hashed = model.transform(pts).localCheckpoint(eager=True)

    def _pairs(left, dist):
        return (
            model.approxSimilarityJoin(left, hashed, dist, distCol="_d")
            .select(
                F.col("datasetA._id").alias("a"),
                F.col("datasetB._id").alias("b"),
                "_d",
            )
            .filter(F.col("a") != F.col("b"))
        )

    # Materialize phase-1 candidates ONCE: they feed the dense-id
    # count, the semi-join back, and (via sparse_pts) the escalation
    # join — without this the LSH explode+join runs three times. The
    # candidate list is cutoff-bounded, so it is the small artifact of
    # the computation, safe to pin.
    phase1 = _pairs(hashed, max_distance).localCheckpoint(eager=True)
    # ids with >= k candidates keep their phase-1 pairs; the rest escalate
    dense_ids = (
        phase1.groupBy("a")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= n_neighbors)
        .select("a")
    )
    sparse_pts = hashed.join(
        dense_ids.withColumnRenamed("a", "_id"), "_id", "left_anti"
    )
    phase2 = _pairs(sparse_pts, 1e12)
    joined = phase1.join(dense_ids, "a", "left_semi").unionByName(phase2)
    w = Window.partitionBy("a").orderBy("_d", "b")
    # knn feeds k-distance, reachability, and the neighbor-lrd join —
    # pin it (n x k rows) so the top-k window runs once.
    knn = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= n_neighbors
    ).localCheckpoint(eager=True)

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
    # A point with NO candidate within max_distance is more isolated
    # than anything the cutoff admitted — i.e. the strongest outlier.
    # Re-attach such points with lof = +Infinity instead of silently
    # dropping them (rank-correct for top-k anomaly queries).
    return (
        df.select(F.col(id_col))
        .join(out, id_col, "left")
        .withColumn("lof", F.coalesce(F.col("lof"), F.lit(float("inf"))))
    )
