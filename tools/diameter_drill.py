#!/usr/bin/env python
"""Pathological-diameter drill: min-label propagation vs two-phase
star contraction (VERDICT r7 task 7).

The co-purchase graphs the CC tier normally sees have tiny diameters
(label-prop converges in <10 rounds, `tools/graph_drill.py`). The
O(diameter)-round cost of label propagation only shows on LONG paths
— so this drill builds disjoint path components of diameter ~2^k and
measures BOTH algorithms' rounds-to-fixpoint and wall seconds across
diameters, at x1/x10 edge volume for the headline diameter.

Expectations (Kiveris et al. 2014):
* label-prop rounds == diameter (min label walks one hop per round);
  wall is ~rounds x fixed per-round job cost locally, so it grows
  LINEARLY with diameter at near-constant data size.
* two-phase rounds ~ O(log^2 n) (in practice ~log2 n); each round is
  heavier (two shuffles + an exact fixpoint probe) but the count
  barely moves from diameter 63 to 1023.

The crossover is what SCALING.md wants on record: below it the
cheaper label-prop rounds win, above it round COUNT dominates and
two-phase must be routed to.

Usage: python tools/diameter_drill.py      (~10 min, quiet host)
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
    connected_components,
    connected_components_twophase,
)
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402

OFFSET = 10_000_000


def path_edges(spark, diameter: int, n_components: int):
    """n_components disjoint paths, each of `diameter` edges —
    vertices c*OFFSET + [0..diameter], edges (i, i+1)."""
    comp = spark.range(n_components).select(
        (F.col("id") * OFFSET).alias("base")
    )
    pos = spark.range(diameter).select(F.col("id").alias("i"))
    return (
        comp.crossJoin(pos)  # n_components x diameter rows, both tiny
        .select(
            (F.col("base") + F.col("i")).alias("a"),
            (F.col("base") + F.col("i") + 1).alias("b"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )


def run_one(algo: str, edges, diameter: int):
    t0 = time.perf_counter()
    if algo == "label_prop":
        labels = connected_components(
            edges, src="a", dst="b",
            max_iter=diameter + 32,
            # probe every 16 rounds: <=15 wasted rounds against
            # diameter-many probe actions saved
            check_every=16 if diameter > 64 else 1,
        )
    else:
        labels = connected_components_twophase(
            edges, src="a", dst="b", max_rounds=60
        )
    n_comp = labels.select("component").distinct().count()
    rounds = LAST_RUN_STATS.get(
        "connected_components" if algo == "label_prop"
        else "connected_components_twophase"
    )
    return round(time.perf_counter() - t0, 2), n_comp, rounds


def main() -> None:
    spark = get_spark(app_name="diameter-drill", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    # diameter sweep at ~constant edge volume (~32k edges), then the
    # headline diameter at x10 volume (~320k edges, same diameter:
    # rounds must NOT grow with volume for either algorithm)
    cases = [
        (63, 512, "x1"),
        (255, 128, "x1"),
        (1023, 32, "x1"),
        (1023, 320, "x10"),
    ]
    for diameter, n_comp_target, tag in cases:
        edges = path_edges(spark, diameter, n_comp_target)
        n_edges = edges.count()
        for algo in ("twophase", "label_prop"):
            wall, n_comp, rounds = run_one(algo, edges, diameter)
            assert n_comp == n_comp_target, (algo, diameter, n_comp)
            row = {
                "algo": algo,
                "diameter": diameter,
                "volume": tag,
                "edges": n_edges,
                "components": n_comp,
                "rounds": rounds,
                "sec": wall,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"drill": "diameter", "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
