#!/usr/bin/env python
"""Stage-level timing probe for ml_lof_distributed (r12 isolation per
guide §1): force each intermediate of distributed_lof with the noop
sink and report per-stage deltas, so the optimization targets the
stage that actually costs, not the plan that looks busiest."""

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lof-probe")
    t = {}

    def mark(name, t0):
        t[name] = time.perf_counter() - t0
        print(f"{name}: {t[name]:.3f}s", flush=True)

    t0 = time.perf_counter()
    emb = load_table(spark, sf_dir, "embeddings")
    df = spread_narrow(emb)
    n_neighbors = 20
    pts = df.select(
        F.col("vec_id").alias("_id"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("_v"),
    )
    mark("plan_setup", t0)

    t0 = time.perf_counter()
    X = _collect_sample(df, "embedding")
    n_total = df.count()
    mark("sample+count", t0)

    t0 = time.perf_counter()
    max_distance = estimate_distance_cutoff(
        df, vec_col="embedding", n_neighbors=n_neighbors, n_total=n_total, X=X
    )
    bucket_length = auto_bucket_length(X, n_total)
    escalate = pairwise_quantile_cutoff(X, n_total, 32.0 * n_neighbors)
    if not np.isfinite(escalate):
        escalate = 1e12
    escalate = max(float(escalate), float(max_distance))
    mark("estimators(driver)", t0)

    t0 = time.perf_counter()
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(pts)
    mark("lsh_fit", t0)

    t0 = time.perf_counter()
    hashed = model.transform(pts).localCheckpoint(eager=True)
    mark("hashed_ckpt", t0)

    def _pairs(left, dist):
        return (
            model.approxSimilarityJoin(left, hashed, dist, distCol="_d")
            .select(F.col("datasetA._id").alias("a"), F.col("datasetB._id").alias("b"), "_d")
            .filter(F.col("a") != F.col("b"))
        )

    t0 = time.perf_counter()
    phase1 = _pairs(hashed, max_distance).localCheckpoint(eager=True)
    mark("phase1_ckpt", t0)
    print(f"  phase1 rows: {phase1.count()}")

    t0 = time.perf_counter()
    dense_ids = (
        phase1.groupBy("a").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= n_neighbors).select("a")
    )
    sparse_pts = hashed.join(dense_ids.withColumnRenamed("a", "_id"), "_id", "left_anti")
    phase2 = _pairs(sparse_pts, escalate)
    joined = phase1.join(dense_ids, "a", "left_semi").unionByName(phase2)
    w = Window.partitionBy("a").orderBy("_d", "b")
    knn = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= n_neighbors
    ).localCheckpoint(eager=True)
    mark("phase2+knn_ckpt", t0)
    print(f"  knn rows: {knn.count()}")

    t0 = time.perf_counter()
    kdist = knn.groupBy("a").agg(F.max("_d").alias("_kdist"))
    reach = (
        knn.join(kdist.select(F.col("a").alias("b"), F.col("_kdist").alias("_kdist_b")), "b")
        .withColumn("_reach", F.greatest("_kdist_b", "_d", F.lit(1e-12)))
    )
    lrd = reach.groupBy("a").agg((F.count(F.lit(1)) / F.sum("_reach")).alias("_lrd"))
    neigh_lrd = knn.join(
        lrd.select(F.col("a").alias("b"), F.col("_lrd").alias("_lrd_b")), "b"
    ).groupBy("a").agg(F.avg("_lrd_b").alias("_mean_lrd_b"))
    out = neigh_lrd.join(lrd, "a").select(
        F.col("a").alias("vec_id"), (F.col("_mean_lrd_b") / F.col("_lrd")).alias("lof")
    )
    final = (
        df.select(F.col("vec_id"))
        .join(out, "vec_id", "left")
        .withColumn("lof", F.coalesce(F.col("lof"), F.lit(float("inf"))))
    )
    force(final)
    mark("lof_assembly_force", t0)

    # Second force of just the assembly (pins warm) to split codegen/first-run
    t0 = time.perf_counter()
    force(final)
    mark("lof_assembly_force2", t0)

    print("TOTAL:", sum(v for k, v in t.items() if k != "lof_assembly_force2"))
    spark.stop()


if __name__ == "__main__":
    main()
