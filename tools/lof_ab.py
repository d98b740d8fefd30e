#!/usr/bin/env python
"""Interleaved A/B harness for ml_lof_distributed variants, alternating
arms in ONE session so host drift hits both equally (AB_ARMS env, e.g.
"mllib,hints"). r12 verdicts: the skinny-pair rewrite of
approxSimilarityJoin was REJECTED (bit-identical but slower — Catalyst
HOFs box per element; see OPTIMIZATION_r12.md non-adoptions), the
phase-2 empty-gate was REJECTED (AQE already collapses the empty join),
and shuffle_hash hints on the lrd/LOF assembly were ADOPTED."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.ml.feature import BucketedRandomProjectionLSH  # noqa: E402
from pyspark.ml.functions import array_to_vector  # noqa: E402
from pyspark.sql import Window, functions as F  # noqa: E402

from financial_anomaly_detection_spark.ml.lof_distributed import (  # noqa: E402
    _collect_sample,
    auto_bucket_length,
    estimate_distance_cutoff,
    pairwise_quantile_cutoff,
)
from financial_anomaly_detection_spark.operators.partitioning import (  # noqa: E402
    spread_narrow,
)
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402
from financial_anomaly_detection_spark.sources.readers import load_table  # noqa: E402


def force(df):
    df.write.format("noop").mode("overwrite").save()


def release_pins(spark):
    try:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)
    except Exception:
        pass


def run_lof(spark, sf_dir, variant: str) -> None:
    df = spread_narrow(load_table(spark, sf_dir, "embeddings"))
    n_neighbors = 20
    pts = df.select(
        F.col("vec_id").alias("_id"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("_v"),
    )
    X = _collect_sample(df, "embedding")
    n_total = df.count()
    max_distance = estimate_distance_cutoff(
        df, vec_col="embedding", n_neighbors=n_neighbors, n_total=n_total, X=X
    )
    bucket_length = auto_bucket_length(X, n_total)
    escalate = pairwise_quantile_cutoff(X, n_total, 32.0 * n_neighbors)
    if not np.isfinite(escalate):
        escalate = 1e12
    escalate = max(float(escalate), float(max_distance))
    model = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length,
        numHashTables=4, seed=42,
    ).fit(pts)
    hashed = model.transform(pts).localCheckpoint(eager=True)

    if variant in ("mllib", "gated", "hints"):
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

    phase1 = _pairs(hashed, max_distance).localCheckpoint(eager=True)
    dense_ids = (
        phase1.groupBy("a").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= n_neighbors).select("a")
    )
    sparse_pts = hashed.join(dense_ids.withColumnRenamed("a", "_id"), "_id", "left_anti")
    if variant == "gated" and sparse_pts.isEmpty():
        joined = phase1.join(dense_ids, "a", "left_semi")
    else:
        phase2 = _pairs(sparse_pts, escalate)
        joined = phase1.join(dense_ids, "a", "left_semi").unionByName(phase2)
    w = Window.partitionBy("a").orderBy("_d", "b")
    knn = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= n_neighbors
    ).localCheckpoint(eager=True)
    h = (lambda d: d.hint("shuffle_hash")) if variant == "hints" else (lambda d: d)
    kdist = knn.groupBy("a").agg(F.max("_d").alias("_kdist"))
    reach = (
        knn.join(h(kdist.select(F.col("a").alias("b"), F.col("_kdist").alias("_kdist_b"))), "b")
        .withColumn("_reach", F.greatest("_kdist_b", "_d", F.lit(1e-12)))
    )
    lrd = reach.groupBy("a").agg((F.count(F.lit(1)) / F.sum("_reach")).alias("_lrd"))
    neigh_lrd = knn.join(
        h(lrd.select(F.col("a").alias("b"), F.col("_lrd").alias("_lrd_b"))), "b"
    ).groupBy("a").agg(F.avg("_lrd_b").alias("_mean_lrd_b"))
    out = neigh_lrd.join(h(lrd), "a").select(
        F.col("a").alias("vec_id"), (F.col("_mean_lrd_b") / F.col("_lrd")).alias("lof")
    )
    final = (
        df.select(F.col("vec_id"))
        .join(h(out), "vec_id", "left")
        .withColumn("lof", F.coalesce(F.col("lof"), F.lit(float("inf"))))
    )
    force(final)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    spark = get_spark("lof-ab")
    # warm both arms once, unmeasured
    arms = tuple(os.environ.get("AB_ARMS", "mllib,skinny").split(","))
    for v in arms:
        run_lof(spark, sf_dir, v)
        release_pins(spark)
    res = {v: [] for v in arms}
    for _ in range(reps):
        for v in arms:
            t0 = time.perf_counter()
            run_lof(spark, sf_dir, v)
            res[v].append(round(time.perf_counter() - t0, 3))
            release_pins(spark)
    for v, ts in res.items():
        print(f"{v}: min={min(ts):.3f} times={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
