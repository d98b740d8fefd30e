#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan summaries for the headline
queries — the runtime evidence behind SCALING.md's claims.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_anomaly_detection_spark.queries import REGISTRY  # noqa: E402
from financial_anomaly_detection_spark.session import get_spark  # noqa: E402

QUERIES = [
    "rules_fusion_risk",
    "profile_join_deviation",
    "window_transform_profile",
    "asof_profile",
    "asof_join_purchase_click",
    "time_range_self_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q9_profit_by_nation_year",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "sessionize_events",
    "dedup_exact_docs",
    # Round-2 additions: TPC-H completion set + text signals.
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q11_important_parts",
    "q12_priority_linestatus",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_volume_customer",
    "q22_dormant_customers",
    "doc_repetition_signals",
    "top_word_fraction",
    "stratified_sample_docs",
    # Round-3 additions: final TPC-H shapes (22/22).
    "q16_supplier_part_counts",
    "q20_promo_part_shippers",
    "q21_waiting_suppliers",
    # Round-4 additions: parallel prefix-sum packing (no
    # single-partition exchange) + quantized ANN ground truth.
    "pack_sequences_2048",
    "curation_pipeline_e2e",
    "ann_exact_quantized",
    # Round-4 additions: hash-parity LSH surrogates + quality/quantize.
    "minhash_exact_md5",
    "minhash_band_pairs_md5",
    "simhash_exact_md5",
    "int8_quantize_embeddings",
    "bigram_coverage_quality",
    # Round-4 additions: retrieval / graph / robust-stats / skyline.
    "bm25_rational_topk",
    "pagerank_part_supplier",
    "mad_robust_outliers",
    "skyline_pareto_parts",
    "chisq_type_drift",
    "gini_user_diversity",
    "weighted_sample_docs",
    "asof_forward_click_purchase",
    "quantile_rank_embeddings",
    "loo_target_encode",
    "ann_simhash_topk",
    # Round-5 additions: streaming replay, sketches, layout, fuzzy /
    # prefix-filter joins, graph, sequence stats.
    "stream_replay_scoring",
    "cms_heavy_hitters",
    "hll_exact_md5",
    "kmv_set_cardinality",
    "bloom_semi_join_prune",
    "zorder_layout_parts",
    "contrastive_negative_pairs",
    "ngram_diversity_by_source",
    "jaccard_pairs_prefix_filter",
    "fuzzy_name_pairs_ed1",
    "triangle_count_copurchase",
    "dedup_rapid_repeats",
    "markov_transition_matrix",
    "ks_value_drift",
    "mannwhitney_value_drift",
    # Round-5b additions: time-series diagnostics, sweep line,
    # span-level dedup, collocations, graph BFS, quantile sketch,
    # fusion, SemDeDup, planning/profiling, sequences.
    "cusum_changepoint_daily",
    "ols_trend_daily",
    "acf_daily_lags",
    "dow_seasonality_index",
    "rolling_median_daily",
    "max_concurrent_sessions",
    "longest_dup_span_pairs",
    "pmi_collocations",
    "bfs_reachability_copurchase",
    "quantile_sketch_values",
    "rrf_fusion_topk",
    "semdedup_embeddings",
    "write_partition_plan",
    "cms_join_cardinality",
    "shuffle_skew_report",
    "table_profile_events",
    "trigram_event_sequences",
    "seasonal_robust_outliers",
    "referential_integrity_audit",
    "hll_weekly_rollup",
    "profile_incremental_merge",
    "bpe_tokenize_docs",
    "ann_pq_topk",
    # Round-6 additions: IVFADC, quantile-sketch rollup, the two-pass
    # rank rewrite of the recon threshold.
    "ann_ivfpq_topk",
    "quantile_sketch_weekly_rollup",
    "ml_recon_mse_threshold",
    # Late-r6 additions: rank association over the daily frame,
    # bivariate Mahalanobis screen.
    "spearman_daily_corr",
    "kendall_tau_daily",
    "mahalanobis_outliers",
    # Late-r6 reshape pair: native unpivot, calendar spine gap-fill.
    "unpivot_daily_metrics",
    "calendar_gap_fill",
    # Late-r6 lakehouse merge: CDC feed compaction + full-outer apply.
    "cdc_upsert_merge",
    # Late-r6 map-typed column function family.
    "map_functions_user_profile",
    # Late-r6 Deequ-style data-quality gate.
    "dq_expectation_checks",
    # Late-r6 hashing-trick vectorization primitive.
    "feature_hashing_docs",
    # Late-r6 interval-union coverage + id-sequence gap audit.
    "interval_union_coverage",
    "sequence_gap_detection",
    # Late-r6 cross-engine levenshtein parity probe.
    "levenshtein_parity_pairs",
    # Round-7 additions: drift/info-theory family on det_ln, skew
    # insurance, SCD2 pair, true-log BM25, IVFADC math pin.
    "psi_value_drift",
    "kl_divergence_daily",
    "entropy_user_types",
    "cramers_v_type_dow",
    "salted_skew_join",
    "cdc_scd2_history",
    "scd2_point_in_time_join",
    "bm25_det_topk",
    "ivfpq_exact_quantized",
    "winnow_fingerprint_md5",
    # Round-8 additions: eval family, decomposition, runtime-filter
    # composition pin, reconciliation checksum, Poisson bootstrap,
    # G2 keyness.
    "threshold_sweep_pr",
    "markov_next_event_hitrate",
    "seasonal_decompose_daily",
    "runtime_filter_semi_join",
    "table_fingerprint_checksum",
    "poisson_bootstrap_ci",
    "keyness_g2_en_vs_rest",
    # Late-r8 additions that landed after the previous regeneration
    # (ADVICE r8: plan_report and test_plan_guards must track together).
    "roc_auc_exact",
    "calibration_ece_bins",
    "doc_lm_cross_entropy",
    "kcore_repeat_copurchase",
    # Round-9 additions: diameter-adaptive CC router, LM-gated
    # curation pipeline v2, eval/stats family completion.
    "cc_auto_copurchase",
    "curation_pipeline_v2",
    "wasserstein_value_drift",
    "woe_iv_event_types",
    "conformal_split_threshold",
    "retrieval_eval_metrics",
    "zipf_slope_fit",
    "source_length_drift",
    "k_anonymity_audit",
    "item_cooccurrence_similarity",
    "decision_stump_split",
    "group_kfold_balance",
    "ransac_trend_daily",
    "attribution_models",
    "ab_test_proportions",
    "anomaly_monitoring_e2e",
    "kaplan_meier_conversion",
    "pareto_revenue_deciles",
    # Round-10 additions: kernel-split bench twins (VERDICT r9 task 8),
    # streaming near-dup batch replay, exact-substring decontamination.
    "ml_kernel_base_pretrained",
    "ml_kernel_iforest_pretrained",
    "ml_kernel_lof_pretrained",
    "ml_kernel_ae_pretrained",
    "stream_neardup_replay",
    "decontam_shared_span",
    "stream_decontam_replay",
    # Round-11 additions: kernel-math oracle surrogates (VERDICT r10
    # task 4).
    "ml_kernel_iforest_exact",
    "ml_kernel_lof_exact",
    "ml_kernel_pca_exact",
    # Round-12 additions: BPE train/apply oracle surrogates (VERDICT
    # r11 task 5).
    "bpe_merges_exact",
    "bpe_tokenize_exact",
]


def summarize(plan: str) -> dict:
    # post-execution adaptive plans append "== Initial Plan ==" — keep
    # only the final (executed) section
    plan = plan.split("== Initial Plan ==")[0]
    lines = plan.splitlines()

    def count(pat: str) -> int:
        return sum(1 for l in lines if re.search(pat, l))

    scans = []
    for l in lines:
        m = re.search(r"FileScan parquet \[([^\]]*)\]", l)
        if m:
            cols = m.group(1)
            ncols = 0 if not cols.strip() else cols.count(",") + 1
            table = "?"
            tm = re.search(r"testdata/sf[0-9.]+/(\w+)\.parquet", l)
            if tm:
                table = tm.group(1)
            scans.append(f"{table}({ncols} cols)")
    # codegen stages appear as "*(<id>)" prefixes in the plan string
    codegen_ids = {m.group(1) for l in lines for m in [re.search(r"\*\((\d+)\)", l)] if m}
    return {
        "shuffles": count(r"Exchange hashpartitioning"),
        "broadcast_joins": count(r"BroadcastHashJoin"),
        "sortmerge_joins": count(r"SortMergeJoin"),
        "nested_loop_joins": count(r"BroadcastNestedLoopJoin|CartesianProduct"),
        "codegen_spans": len(codegen_ids),
        "scans": scans,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # Provenance stamp (round-12 advisory): a PLANS row can only serve
    # as a regression baseline if the code it was generated FROM is
    # knowable — the r11 review found a q21 row drift with no q21
    # commit in range, adjudicated as a stale prior artifact (the
    # current row reproduces bit-identically across sessions).
    try:
        import subprocess

        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        dirty = bool(
            subprocess.run(
                ["git", "status", "--porcelain", "--untracked-files=no"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        )
    except Exception:
        commit, dirty = "unknown", False
    spark = get_spark(app_name="plan-report", master="local[4]", shuffle_partitions=8)
    out = [
        "# PLANS — physical-plan evidence for the headline queries",
        "",
        f"Generated by `tools/plan_report.py` against `{sf_dir}` at commit",
        f"`{commit}`{' (dirty tree)' if dirty else ''}. Each row",
        "summarizes the EXECUTED plan (post-AQE where applicable):",
        "shuffle exchanges, join strategies, whole-stage-codegen spans, and",
        "per-scan column pruning. Regenerate after plan-affecting changes.",
        "Rows are stable per commit EXCEPT a known +-1 AQE",
        "shuffle-coalesce flip on ann_simhash_topk / kmv_set_cardinality",
        "(observed across back-to-back regenerations at eb7082e); any",
        "OTHER row diff without a code diff means the artifact predates",
        "the code it sits next to.",
        "",
        "| query | shuffles | BHJ | SMJ | NLJ | codegen | pruned scans |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        df = REGISTRY[name].fn(spark, sf_dir)
        # execute first: AQE finalizes the plan (isFinalPlan=true) and
        # codegen stage markers (*(n)) only appear post-execution
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        out.append(
            f"| {name} | {s['shuffles']} | {s['broadcast_joins']} | "
            f"{s['sortmerge_joins']} | {s['nested_loop_joins']} | "
            f"{s['codegen_spans']} | {', '.join(s['scans'])} |"
        )
    out += [
        "",
        "Reading guide: BHJ = BroadcastHashJoin (dimension/profile sides",
        "broadcast — facts never reshuffled for enrichment); SMJ appears",
        "only where both sides are fact-scale; NLJ must stay 0 for every",
        "operator EXCEPT (a) the brute-force ANN tier, where the all-pairs",
        "nested loop IS the semantics (its scale twins, ann_lsh_topk and",
        "ann_ivf_topk, plan as equi-joins), (b) the two-pass parallel",
        "prefix scan's triangular join over its <=64-row bucket-subtotal",
        "table (ks/mannwhitney/packing — a bounded broadcast by design),",
        "and (c) broadcast single-row scalar joins (hll/kmv ledgers,",
        "pagerank's n). The range/as-of operators are engineered to avoid",
        "nested-loop plans via bin bucketing and union+last_value.",
        "'pruned scans' lists each parquet scan with the column count",
        "that actually reaches the reader (ReadSchema pruning); an empty",
        "cell means the query reads a pinned (localCheckpoint) artifact,",
        "not parquet.",
        "",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(QUERIES)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
