"""BENCH harness (BASELINE.md protocol): run the headline queries at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Per query: one warm-up run then median of 5 timed runs (each run is a full
re-execution — count() action — so scan+shuffle cost is included; nothing is
cached between runs). Five, not three: measured run-to-run noise on this
box reaches ±30% for sub-second queries, and a median of 5 keeps one
contended run from flagging a phantom regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from thewhisperdb_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family (scan/filter, agg, joins, window,
# sessionize, tag join, jaccard join, vector pair join, kNN, graph, dedup).
HEADLINE = [
    "filter_conjunction",
    "sort_offset_limit",
    "tag_histogram",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "revenue_by_region",
    "window_top_orders_per_customer",
    "events_windowed_agg",
    "events_sessionize",
    "shared_tag_join",
    "jaccard_threshold_join",
    "similar_pairs_threshold",
    "topk_similar",
    "knn_join",
    "connected_components",
    "dedup_exact",
    "minhash_lsh_dedup",
    "asof_join_last_order",
    "rollup_revenue_region_nation",
    "brand_type_revenue",
    "running_revenue_per_customer",
    "order_price_deciles",
    "tfidf_top_terms",
    "ivf_knn",
    # round-2 training-pipeline headliners
    "decontaminate_train_test",
    "quality_filter_pipeline",
    "word_freq_topk",
    "bm25_search",
    "line_dedup_reconstruct",
    # round-2 second-wave headliners (tokenizer/retrieval/relational/layout)
    "token_entropy_score",
    "bpe_pair_counts",
    "phrase_search",
    "scd2_point_in_time_join",
    "orc_roundtrip_by_source",
    # round-2 third-wave headliners (retrieval fusion/graph/events/CDC)
    "hybrid_search_rrf",
    "bfs_hops",
    "rolling_active_users_7d",
    "part_cooccurrence_top",
    "event_trigrams_top",
    "snapshot_diff_cdc",
    "events_robust_outliers",
    "fuzzy_vocab_pairs",
    # round-3 headliners (iterative graph kernels + analytic-SQL surface)
    "pagerank_top",
    "label_prop_communities",
    "graph_core_numbers",
    "ntile_customer_spend",
    "top3_parts_per_brand",
    "nation_market_share",
    "monthly_revenue_trend",
    "cms_word_counts",
    "doc_fingerprint",
    "events_time_heatmap",
    # round-4 headliners (pretraining-quality wave)
    "gopher_quality_flags",
    "top_ngram_char_fraction",
    "dup_ngram_char_fraction",
    "domain_mixture_weights",
    "contamination_overlap_score",
    "hypertable_multi_rollup",
    "asof_join_nearest",
    "dataset_release_report",
    "tpch_q6_forecast_revenue",
    "tpch_q4_late_ship_priority",
    "tpch_q10_returned_revenue",
    "tpch_q12_linestatus_priority",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "events_distinct_users_hll_portable",
    "winnowing_fingerprints",
    "winnow_overlap_pairs",
    # round-4b headliners (TPC-H second wave)
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    # round-4b headliners (sketches, CDC, SCD2, islands, DQ)
    "events_distinct_users_kmv",
    "event_type_user_overlap_kmv",
    "training_shard_manifest",
    "cdc_apply_reconstruct",
    "scd2_build_user_status",
    "user_active_time_islands",
    "event_transition_matrix",
    "data_quality_report",
    "benford_digit_report",
    "price_quantiles_kmv_sample",
    "rolling_distinct_users_kmv_7d",
    # round-6 headliners (TPC-H closed at 22/22 via fabricated partsupp)
    "tpch_q2_minimum_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q20_potential_promotion",
    # round-7 headliners (snapshot-drift monitors)
    "corpus_drift_report",
    "length_drift_report",
    # round-8 headliner (asymmetric containment dedup)
    "containment_dedup_pairs",
    # round-9 headliners (perceptual dedup; HTML->text; URL/domain)
    "image_dhash_dedup_contract",
    "html_extract_roundtrip",
    # round-10 headliners (PSL grouping; WARC->curation composite;
    # robots.txt admission)
    "url_psl_registrable",
    "crawl_curation_pipeline",
    "robots_allow_filter",
    "charset_sniff_decode",
    "pii_scrub_roundtrip",
    "lm_quality_bits",
    "compression_quality_flags",
    "tokenizer_fertility_by_lang",
    # round-11 headliners (IDN-aware PSL grouping; quality ensemble)
    "idn_psl_registrable",
    "quality_ensemble_keep",
    # round-12 headliners (real profile langID + CCNet buckets; threshold
    # sweep; Avro OCF round-trip)
    "language_id_profile",
    "ccnet_perplexity_buckets",
    "quality_threshold_sweep",
    "avro_roundtrip_by_source",
    "mixture_epoch_schedule",
    "frontier_politeness_schedule",
]

# Index-maintenance keys (VERDICT r8 #7): NOT in the headline total —
# each run rebuilds a persisted index from scratch (~10-30s of setup that
# would swamp the per-operator comparison and double the headline sum) —
# but measured each round in a separate section so BASELINE.md rows exist
# and regressions in the most mutation-heavy keys are diffable. Median of
# 3 (not 5): every run is >9s, where the ±30% small-query noise floor
# does not apply, and the extra 2 runs would cost ~2 min of wall-clock.
MAINTENANCE = [
    "lsh_index_delete",
    "lsh_index_stats",
    "ivf_index_delete",
    "ivf_index_stats",
    # r9: perceptual-hash index (build + banded probe per call)
    "dhash_index_incremental_dedup",
    # r10: MJPEG-in-AVI frame dedup through the persisted hash index
    "video_frame_dedup_contract",
    # r11: clip-level (temporal) video/audio dedup — packed-window
    # hamming over frame/segment fingerprint sequences
    "video_clip_dedup_contract",
    "audio_clip_dedup_contract",
    # r10: the streaming crawl-curation loop (two ingests + replay)
    "crawl_curation_stream_twin",
]


# Session-shift calibration (VERDICT r10 #1): cross-session drift on this
# box reaches ~1.4-1.5x uniformly, the same order as the 2x regression
# gate. The calibration key is measured FIRST in every session (before any
# other query warms caches/JIT beyond its own warm-up) under the exact
# headline protocol; its ratio to the committed row divides the shift out
# mechanically when comparing any other key to its BASELINE.md row.
CALIBRATION_KEY = "tpch_q1_pricing_summary"
# committed first-in-session median from the r11 consolidated baseline
# re-record (BASELINE.md "r11 consolidated baseline": medians 0.495 /
# 0.563 / 0.726 over the three runs); update ONLY when re-recording the
# whole table.
CALIBRATION_ROW_SEC = 0.563


def _release_dead_rdd_blocks(spark) -> None:
    """Drop block-manager blocks of persistent RDDs between bench keys
    (optimization r13, VERDICT r12 #6 — OUTSIDE every timed region,
    additions-only so per-key methodology is unchanged). A 123-key sweep
    accumulates every key's localCheckpoint RDD blocks until the JVM
    collects the Python-side references; late-run keys were drifting
    slower as the block manager filled (r12 closing sweeps measured the
    checkpoint-heavy kernels 1.3-1.5x their isolated times late in a
    session). Every per-run frame is rebuilt from parquet by the next
    fn() call, and no cross-key cache holds a checkpointed frame (the
    catalog/PSL/langid caches hold lazy plans and local relations), so
    unpersisting here can never invalidate state a later key needs."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist(False)
    except Exception:
        pass  # cleanup is best-effort; never fail the bench


def _measure(fn, spark, sf_dir, runs=5):
    fn(spark, sf_dir).count()       # warm-up (JIT, code cache, listing)
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    return round(statistics.median(times), 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    cal_sec = _measure(qs[CALIBRATION_KEY], spark, sf_dir)
    calibration = {
        "key": CALIBRATION_KEY,
        "sec": cal_sec,
        "row_sec": CALIBRATION_ROW_SEC,
        "ratio_to_row": (round(cal_sec / CALIBRATION_ROW_SEC, 3)
                         if CALIBRATION_ROW_SEC else None),
    }
    print(f"# calibration {CALIBRATION_KEY}: {cal_sec}s "
          f"(ratio {calibration['ratio_to_row']})", file=sys.stderr)
    timings: dict[str, float] = {}
    for key in HEADLINE:
        fn = qs[key]
        # GC between queries: 80+ queries in one JVM accumulate broadcast/
        # shuffle refs, and a collection landing mid-measurement skews a
        # whole median (observed: one key at 3x its isolated time deep
        # into the run). A hinted collection here is outside the timed
        # region and keeps per-key numbers comparable to isolated runs.
        _release_dead_rdd_blocks(spark)
        spark.sparkContext._jvm.System.gc()
        fn(spark, sf_dir).count()  # warm-up (JIT, code cache, file listing)
        runs = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[key] = round(statistics.median(runs), 3)
        print(f"# {key}: {timings[key]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    # Maintenance keys run in two timed phases (VERDICT r9 #2): the
    # from-scratch index BUILD (many small writes — the variance the r9
    # drift traced to) and the maintenance OP (delete/stats/probe — the
    # read path a regression would actually hurt). `maintenance` keeps the
    # historical total for BASELINE.md row continuity; `maintenance_split`
    # carries the per-phase medians.
    split_fns = entrymod.maintenance_split()
    maintenance: dict[str, float] = {}
    maintenance_split: dict[str, dict[str, float]] = {}
    for key in MAINTENANCE:
        phases = split_fns[key]
        _release_dead_rdd_blocks(spark)
        spark.sparkContext._jvm.System.gc()
        b, o = phases(spark, sf_dir)
        b()
        o().count()  # warm-up (full lifecycle)
        builds, ops = [], []
        for _ in range(3):
            b, o = phases(spark, sf_dir)
            t0 = time.time()
            b()
            t1 = time.time()
            o().count()
            t2 = time.time()
            builds.append(t1 - t0)
            ops.append(t2 - t1)
        bsec = round(statistics.median(builds), 3)
        osec = round(statistics.median(ops), 3)
        maintenance_split[key] = {"build_sec": bsec, "op_sec": osec}
        maintenance[key] = round(bsec + osec, 3)
        print(f"# {key}: build {bsec}s + op {osec}s (maintenance)",
              file=sys.stderr)
    # Full per-query map goes to a file: with 90 headline keys the one-line
    # JSON outgrew the driver's ~2KB stdout tail capture in r4 and the round
    # recorded "parsed: null". The LAST stdout line is now a compact summary
    # (metric/value/unit/sf + the 10 slowest keys) that always fits.
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "maintenance": maintenance,
        "maintenance_split": maintenance_split,
        "calibration": calibration,
        "sf": float(sf),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
        "cal": calibration["ratio_to_row"],
        "queries": slowest,
    }))


if __name__ == "__main__":
    main()
