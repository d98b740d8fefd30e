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

# The round-1 headline set — kept first and summed separately as
# "headline_sec" so round-over-round totals stay comparable.
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

# Extension tiers (minhash/simhash/IVF/TF-IDF/...) benched since round 2
# so regressions in the scale paths are visible per-round.
EXTENDED = [
    # TPC-H shapes
    "q2_min_cost_supplier",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_revenue",
    "q14_promo_revenue_pct",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q11_important_parts",
    "q12_priority_linestatus",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_volume_customer",
    "q22_dormant_customers",
    "q16_supplier_part_counts",
    "q20_promo_part_shippers",
    "q21_waiting_suppliers",
    # dedup tiers
    "dedup_keep_first",
    "ngram_jaccard_pairs",
    "minhash_near_dup",
    "simhash_near_dup",
    "near_dup_clusters",
    # similarity tiers
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_near_dup",
    # text pipeline
    "lang_token_stats",
    "text_lang_fingerprint",
    "text_quality_profile",
    "chunk_text_windows",
    "tfidf_top_terms",
    "pii_scrub_documents",
    "doc_repetition_signals",
    "top_word_fraction",
    "stratified_sample_docs",
    "c4_quality_filters",
    "benchmark_contamination",
    "source_temperature_weights",
    "pack_sequences_2048",
    # financial-anomaly analytics
    "rolling_zscore_events",
    "benford_first_digit",
    "lof_exact_quantized",
    "curation_pipeline_e2e",
    # windows / sessions / range
    "rank_windows",
    "ntile_distribution_ranks",
    "sessionize_events",
    "time_range_window_profile",
    "time_range_self_join",
    "asof_join_purchase_click",
    # agg shapes
    "cube_nation_priority",
    "pivot_event_type_daily",
    "union_all_monthly_activity",
    "approx_distinct_users",
    "deterministic_split",
    # ML tiers (fit + score at sf embeddings scale)
    "ml_iforest_embeddings",
    "ml_lof_distributed",
    "ml_reconstruction_embeddings",
    # multimodal decode tiers (real PNG/WAV codecs via mapInPandas)
    "multimodal_image_features",
    "multimodal_audio_features",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="fad-spark-bench", master=f"local[{cpus}]")

    names = [n for n in HEADLINE + EXTENDED if n in REGISTRY]
    # Warmup: pay JVM/codegen startup outside the measured window.
    try:
        force(REGISTRY[names[0]].fn(spark, sf_dir))
    except Exception:
        pass

    # One failing query must not zero the whole round's bench (round 2
    # lost every number to a single AnalysisException): record the error
    # and keep timing the rest.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            force(REGISTRY[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    headline = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "headline_sec": headline,
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
