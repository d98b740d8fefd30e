#!/usr/bin/env python
"""Scale drill for the k-core peel operator (VERDICT r8 task 8).

CC's rounds are bounded by graph DIAMETER (measured flat under
replication, tools/graph_drill.py); k-core's rounds are its PEEL
DEPTH — the length of the deletion cascade — which is a property of
local density, not size, but unlike diameter it can grow when density
changes. This drill separates three axes:

* volume axis: the sf0.1 repeat-co-purchase graph (the registered
  query's graph, k=3) replicated x1/x3/x10 with disjoint id offsets
  (organic growth: more components, same per-component structure).
  Expectation: rounds EXACTLY constant (peeling runs independently
  inside each replica), wall ~linear in edges.
* k axis on the same graph (k=4,5): deeper deletion thresholds on
  fixed data.
* transition axis: the PLAIN co-purchase graph (~1.2M edges, near-
  random degree ~119 +- 30) swept across k — peel depth peaks at the
  core-collapse transition (the known cascade-criticality shape:
  far below the transition one round deletes almost nothing, far
  above it one round deletes almost everything; AT it, each round
  pushes a thin margin of vertices under k and the cascade chains).
  Replication is repeated at the transition k to confirm rounds stay
  volume-invariant even at the worst k.

Recorded against the 20-round oracle unroll margin
(tests/test_graph.py pins <= 14 at the sf0.01 driver gate).

Usage: python tools/kcore_drill.py      (~4 min, quiet host)
Appends one JSON line per measurement to stdout; summarized in
SCALING.md §round-9.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from financial_anomaly_detection_spark.operators.graph import (  # noqa: E402
    LAST_RUN_STATS,
    k_core,
)
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402
from financial_anomaly_detection_spark.sources.readers import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000


def repeat_copurchase_pairs(li):
    """The kcore_repeat_copurchase query's edge build: parts co-bought
    in >= 2 distinct orders (array-native pair expansion per order)."""
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


def replicate(base, scale, a="pa", b="pb"):
    reps = [
        base.select(
            (F.col(a) + F.lit(i * OFFSET)).alias(a),
            (F.col(b) + F.lit(i * OFFSET)).alias(b),
        )
        for i in range(scale)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out.localCheckpoint(eager=True)


def measure(edge_df, k, a, b, **tags):
    t0 = time.perf_counter()
    core = k_core(edge_df, k=k, src=a, dst=b, max_rounds=200)
    n_core = core.count()
    row = {
        "op": "k_core", "k": k, "core_vertices": n_core,
        "rounds": LAST_RUN_STATS.get("k_core"),
        "sec": round(time.perf_counter() - t0, 2), **tags,
    }
    print(json.dumps(row))
    return row


def main() -> None:
    spark = get_spark(app_name="kcore-drill", master="local[32]")
    li = load_table(spark, SRC, "lineitem")
    rep = repeat_copurchase_pairs(li).localCheckpoint(eager=True)
    n_rep = rep.count()
    print(f"repeat-co-purchase edges: {n_rep}", file=sys.stderr)

    rows = []
    # volume axis on the registered query's graph
    for scale in (1, 3, 10):
        edges = rep if scale == 1 else replicate(rep, scale)
        rows.append(
            measure(edges, 3, "pa", "pb", axis="volume", scale=scale,
                    edges=n_rep * scale)
        )
    # k axis on the same graph
    for k in (4, 5):
        rows.append(
            measure(rep, k, "pa", "pb", axis="k", scale=1, edges=n_rep)
        )

    # transition axis on the plain co-purchase graph
    from financial_anomaly_detection_spark.queries import _copurchase_pairs

    plain = _copurchase_pairs(li).localCheckpoint(eager=True)
    n_plain = plain.count()
    print(f"plain co-purchase edges: {n_plain}", file=sys.stderr)
    peak_k, peak_rounds = None, -1
    for k in (64, 80, 88, 96, 112):
        r = measure(plain, k, "a", "b", axis="transition", scale=1,
                    edges=n_plain)
        if r["rounds"] > peak_rounds:
            peak_k, peak_rounds = k, r["rounds"]
        rows.append(r)
    # volume invariance AT the worst (peak-cascade) k
    edges3 = replicate(plain, 3, "a", "b")
    rows.append(
        measure(edges3, peak_k, "a", "b", axis="transition_volume",
                scale=3, edges=n_plain * 3)
    )

    print(json.dumps({"drill": "kcore", "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
