#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the ``noop`` datasource sink
(full JVM-side computation, no collect-to-driver bottleneck, no
count()-only plan pruning). One warmup run of the first query pays
session/JIT startup so per-query numbers measure the plans.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "rules_fusion_risk",
    "profile_join_deviation",
    "window_transform_profile",
    "asof_profile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "percentile_thresholds",
    "dedup_exact_docs",
    "text_quality_stats",
    "ann_cosine_topk",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="fad-spark-bench", master=f"local[{cpus}]")

    names = [n for n in HEADLINE if n in REGISTRY]
    # Warmup: pay JVM/codegen startup outside the measured window.
    force(REGISTRY[names[0]].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        force(REGISTRY[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
