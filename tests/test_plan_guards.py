"""Physical-plan regression guards.

PLANS.md documents the plans we want; this test FAILS if a future
change silently de-optimizes one — an unplanned nested-loop join
appearing, or a scan reading more columns than the query needs
(pruning lost). Expectations were generated from the current plans
(tools/plan_report.py logic) and reviewed against SCALING.md's design
claims. Explain-only: nothing executes.
"""

from __future__ import annotations

import re

import pytest

from financial_anomaly_detection_spark.queries import REGISTRY

# name -> (max NLJ/cartesian nodes, {table: max scan columns}).
# The three queries allowed one NLJ broadcast a single-row/oracle-tier
# side by design: ann_cosine_topk (exact all-pairs baseline),
# q11/q22 (scalar-aggregate threshold join).
EXPECTED = {
    "rules_fusion_risk": (0, {"events": 6}),
    "profile_join_deviation": (0, {"events": 4}),
    "window_transform_profile": (0, {"events": 3}),
    "asof_profile": (0, {"events": 4}),
    "asof_join_purchase_click": (0, {"events": 5}),
    "time_range_self_join": (0, {"events": 3}),
    "q1_pricing_summary": (0, {"lineitem": 7}),
    "q3_shipping_priority": (0, {"lineitem": 4, "orders": 3, "customer": 2}),
    "q5_region_volume": (
        0,
        {"lineitem": 4, "orders": 3, "customer": 1, "supplier": 2,
         "nation": 3, "region": 1},
    ),
    "q9_profit_by_nation_year": (
        0,
        {"lineitem": 6, "orders": 2, "part": 2, "supplier": 2, "nation": 2},
    ),
    "q16_supplier_part_counts": (0, {"lineitem": 2, "supplier": 2, "part": 4}),
    "q20_promo_part_shippers": (0, {"supplier": 3, "lineitem": 4, "part": 2}),
    "q21_waiting_suppliers": (0, {"lineitem": 3, "orders": 2, "supplier": 2}),
    "sessionize_events": (0, {"events": 3}),
    "dedup_exact_docs": (0, {"documents": 2}),
    "ngram_jaccard_pairs": (0, {"documents": 2}),
    # gram table is pinned via localCheckpoint: the plan reads the
    # materialized RDD, so no parquet scan appears downstream
    "benchmark_contamination": (0, {}),
    "c4_quality_filters": (0, {"documents": 3}),
    "ann_cosine_topk": (1, {"embeddings": 2}),
    "q11_important_parts": (1, {"lineitem": 3}),
    "q22_dormant_customers": (1, {"customer": 3, "orders": 2}),
}


@pytest.fixture(autouse=True)
def _fresh_plans(spark):
    # other test modules cache tables on the shared session; a cached
    # relation plans as InMemoryTableScan and hides the parquet scan
    # this module asserts on
    spark.catalog.clearCache()
    yield


def _plan(spark, name, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _scan_cols(plan: str) -> dict[str, int]:
    scans: dict[str, int] = {}
    for block in re.split(r"\n\s*\n", plan):
        if "Scan parquet" not in block:
            continue
        tm = re.search(r"[/\\](\w+)\.parquet", block)
        sm = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if tm and sm:
            t, s = tm.group(1), sm.group(1)
            nc = 0 if not s.strip() else s.count(",") + 1
            scans[t] = max(scans.get(t, 0), nc)
    return scans


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_no_unplanned_nested_loop_join(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    # "(id) NodeName" detail headers count each physical node exactly once
    nlj = len(re.findall(r"\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)", plan))
    allowed = EXPECTED[name][0]
    assert nlj <= allowed, (
        f"{name}: {nlj} nested-loop/cartesian joins (allowed {allowed})"
    )


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_scans_stay_column_pruned(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    scans = _scan_cols(plan)
    if not EXPECTED[name][1]:
        # plan reads a pinned (checkpointed) intermediate, not parquet
        assert not scans, f"{name}: unexpected parquet scans {scans}"
        return
    assert scans, f"{name}: no parquet scans found in plan"
    for table, ncols in scans.items():
        allowed = EXPECTED[name][1].get(table)
        assert allowed is not None, f"{name}: unexpected scan of {table}"
        assert ncols <= allowed, (
            f"{name}: scan of {table} reads {ncols} cols (pruned max {allowed})"
        )
