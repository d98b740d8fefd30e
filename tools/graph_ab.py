#!/usr/bin/env python
"""Interleaved A/B for the r13 k-core / two-phase-CC loop changes,
alternating old/new arms in ONE session so host drift hits both arms
equally (the r12 lesson: cross-session isolated profiles on this host
class swing 2-4x; only paired interleaved reps decide adoptions).

Arms:
  kcore_old / kcore_new       — symmetric+eager-checkpoint loop (r12)
                                 vs oriented+lazy-checkpoint loop (r13)
  twophase_old / twophase_new — eager checkpoint + stats job (r12)
                                 vs lazy checkpoint materialized by the
                                 stats job (r13)

The OLD arms are verbatim copies of the r12 operator bodies; the NEW
arms call the live operators. Usage:
    AB_REPS=4 AB_SET=kcore|twophase python tools/graph_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from financial_anomaly_detection_spark.operators.graph import (  # noqa: E402
    _free_checkpoint,
    connected_components_twophase,
    k_core,
)
from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402,F401
from financial_anomaly_detection_spark.queries.common import (  # noqa: E402
    _copurchase_pairs,
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


# --- r12 operator bodies, verbatim -----------------------------------------


def k_core_old(edges, k=3, src="s", dst="d", out_vertex="node",
               out_col="core_degree", max_rounds=50):
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
    )
    cur = (
        e.unionAll(e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    first = cur
    n_cur = cur.count()
    try:
        for rnd in range(max_rounds):
            deg = cur.groupBy("_a").agg(F.count(F.lit(1)).alias("_deg"))
            keep = deg.filter(F.col("_deg") >= k).select("_a")
            nxt = (
                cur.join(keep.hint("shuffle_hash"), "_a", "left_semi")
                .join(
                    keep.withColumnRenamed("_a", "_b").hint("shuffle_hash"),
                    "_b",
                    "left_semi",
                )
                .localCheckpoint(eager=True)
            )
            n_nxt = nxt.count()
            if cur is not first:
                _free_checkpoint(cur)
            cur, n_prev = nxt, n_cur
            n_cur = n_nxt
            if n_nxt == n_prev:
                return cur.groupBy("_a").agg(
                    F.count(F.lit(1)).alias(out_col)
                ).select(F.col("_a").alias(out_vertex), F.col(out_col))
        raise ValueError("no converge")
    finally:
        _free_checkpoint(first)


def twophase_old(edges, src="s", dst="d", out_vertex="node",
                 out_col="component", max_rounds=30):
    def _stats(df: DataFrame) -> tuple:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("_a", "_b")).alias("h"),
        ).head()
        return r["n"], r["h"]

    e0 = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e0.select(F.col("_a").alias("_v"))
        .unionAll(e0.select(F.col("_b").alias("_v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = e0
    cur_stats = _stats(e0)
    try:
        for rnd in range(max_rounds):
            sym = cur.select(F.col("_a").alias("_u"), F.col("_b").alias("_w")).unionAll(
                cur.select(F.col("_b").alias("_u"), F.col("_a").alias("_w"))
            )
            m = sym.groupBy("_u").agg(
                F.least(F.min("_w"), F.first("_u")).alias("_m")
            )
            large = (
                sym.join(m.hint("shuffle_hash"), "_u")
                .filter(F.col("_w") > F.col("_u"))
                .select(F.col("_w").alias("_a"), F.col("_m").alias("_b"))
                .filter(F.col("_a") != F.col("_b"))
                .distinct()
            )
            oriented = large.select(
                F.greatest("_a", "_b").alias("_u"), F.least("_a", "_b").alias("_w")
            )
            m2 = oriented.groupBy("_u").agg(F.min("_w").alias("_m"))
            attached = oriented.join(m2.hint("shuffle_hash"), "_u")
            nxt = (
                attached.select(F.col("_w").alias("_a"), F.col("_m").alias("_b"))
                .unionAll(
                    attached.select(F.col("_u").alias("_a"), F.col("_m").alias("_b"))
                )
                .filter(F.col("_a") != F.col("_b"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            nxt_stats = _stats(nxt)
            same = nxt_stats == cur_stats and (
                nxt.exceptAll(cur).limit(1).count() == 0
            )
            if cur is not e0:
                _free_checkpoint(cur)
            cur, cur_stats = nxt, nxt_stats
            if same:
                roots = cur.select(
                    F.col("_a").alias("_v"), F.col("_b").alias("_lbl")
                )
                return (
                    verts.join(roots, "_v", "left")
                    .select(
                        F.col("_v").alias(out_vertex),
                        F.coalesce("_lbl", F.col("_v")).alias(out_col),
                    )
                )
        raise ValueError("no converge")
    finally:
        _free_checkpoint(e0)


# --- query-shaped inputs -----------------------------------------------------


def kcore_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("ps"), i + 2, F.greatest(F.size("ps") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    return (
        per_order.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("pa", "pb")
    )


def cc_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 1000)
    return _copurchase_pairs(li)


ARMS = {
    "kcore_old": lambda s, d: k_core_old(kcore_pairs(s, d), k=3, src="pa", dst="pb"),
    "kcore_new": lambda s, d: k_core(kcore_pairs(s, d), k=3, src="pa", dst="pb"),
    "twophase_old": lambda s, d: twophase_old(cc_pairs(s, d), src="a", dst="b"),
    "twophase_new": lambda s, d: connected_components_twophase(
        cc_pairs(s, d), src="a", dst="b"
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    which = os.environ.get("AB_SET", "kcore")
    arms = [f"{which}_old", f"{which}_new"]
    spark = get_spark("graph-ab")
    for v in arms:  # warm both arms once, unmeasured
        force(ARMS[v](spark, sf_dir))
        release_pins(spark)
    res = {v: [] for v in arms}
    for _ in range(reps):
        for v in arms:
            spark.sparkContext.setJobDescription(f"graph_ab {v}")
            t0 = time.perf_counter()
            force(ARMS[v](spark, sf_dir))
            res[v].append(round(time.perf_counter() - t0, 3))
            release_pins(spark)
    for v, ts in res.items():
        print(f"{v}: min={min(ts):.3f} times={ts}")
    pairs = list(zip(res[arms[0]], res[arms[1]]))
    print("paired (old, new):", pairs,
          "new_faster:", sum(1 for a, b in pairs if b < a), "/", len(pairs))
    spark.stop()


if __name__ == "__main__":
    main()
