#!/usr/bin/env python
"""Fast oracle-parity check for a SUBSET of registered queries.

Same gate as tests/driver_sim.py (DuckDB differential compare through
the driver-canonicalizer) but only for the named queries — the
per-change verification loop of the optimization round, so a 3-query
edit doesn't pay the full 240-query sweep. Rows-only queries run
through the canonicalizer and report row counts.

Usage:
    SPARK_GRAFT_SIM_SF_DIR=/root/testdata/sf0.01 \
        python tools/sim_subset.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from tests.oracle_harness import (  # noqa: E402
    assert_canonicalizer_safe,
    compare,
    duck_connection,
)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: sim_subset.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
    # Driver-style plain session (no engine confs pre-set).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sim-subset")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)
    fails = 0
    for name in names:
        q = REGISTRY[name]
        sdf = q.fn(spark, sf_dir)
        if q.oracle is None:
            rows = sdf.collect()
            assert_canonicalizer_safe(sdf, name, rows=[tuple(r) for r in rows])
            print(f"ROWSONLY {name}: rows={len(rows)}")
            continue
        res = compare(sdf, con, q.oracle)
        ok = bool(
            res.get("rowcount_match")
            and res.get("schema_match")
            and res.get("values_match")
        )
        print(f"{'MATCH' if ok else 'MISMATCH'} {name}: {res}")
        if not ok:
            fails += 1
    print(f"RESULT: {'ALL MATCH' if fails == 0 else f'{fails} MISMATCHES'}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
