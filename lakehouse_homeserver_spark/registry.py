"""Central query registry: merges every operator module's QUERIES/ORACLES.

This is the single source of truth consumed by ``__spark_entry__.py``
(driver contract) and by the local parity tests / bench.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []

# Driver-verification priority. The correctness harness budgets ~50
# entries per round, taken in registry order; names listed here are
# emitted first, in this order; everything else follows in module
# order.
#
# STANDING CADENCE (VERDICT r6 next-round #2, adopted as the default
# for every future round): the window is filled in this order —
#   1. queries whose code/oracle changed after their latest driver
#      verdict (the r5 rule, applied exhaustively: own body, shared
#      helper, fixture tag, or kernel — anything on the result path);
#   2. any remaining slots go to rolling re-certification,
#      OLDEST-VERDICT-FIRST (compute the union of CORRECTNESS_r* and
#      take the earliest latest-round entries), so session-tuning
#      drift can't age a verdict past ~2-3 rounds unnoticed.
#
# ROUND-12 window = 50 names, machine-derived
# (`scripts/stale_verdicts.py`, enforced by tests/test_stale_verdicts.py).
# Composition (VERDICT r11 next-round #1/#2/#3/#6):
#   (a) NEW queries, never sampled (3): a57_sql_dml (the SQL-text
#       MERGE/UPDATE/DELETE front-end routed to the certified
#       SnapshotTable ops — r11 #2), a58_avro_manifest (from-spec
#       Avro OCF + Iceberg manifest-list export with an independent
#       reader round-trip — r11 #3), k7_multimodal_export (the
#       dedup -> Gopher gate -> WebDataset-shard export composition —
#       r11 #6);
#   (b) r12 edit hits (5): k5_gif_decode (ADVICE r11 zero-dimension
#       geometry guard + the r12 LZW kernel rewrite), and the four
#       optimization-round behavior-adjacent edits — a34_profile
#       (Expand+Sort -> per-column groupBy restructure),
#       a40_agg_pushdown (fresh-read fix under its conf window),
#       a30_stream_upsert_totals (landing-prep sort reuse),
#       i12_stateful_session_timeout (sessionize_fn per-key rewrite).
#       They take the 4 slots of the alphabetically-last (d) names
#       (k3_knn_lsh, k3_mmr_rerank, k3_pq_quantize,
#       k3_random_projection — valid r6 verdicts, lead the r13 age
#       pool together with the three r11 leftovers);
#   (c) the ENTIRE r5-era verdict-age tier (23): the a45/a46/a48
#       plan-fact certs, the k4 classic text-quality family, the
#       k6 sampling family, k7_incremental_dedup/k7_shard_manifest,
#       the sql_* dialect batch, ts_pattern_match;
#   (d) 23 of the 26-name r6-era tier, alphabetical within the tie —
#       the 3 alphabetically-last (k5_multimodal_meta,
#       k8_decontaminate, ts_value_spikes) carry valid r6 verdicts,
#       were NOT edited this round, and lead the r13 age pool (the
#       r11 verdict's #1 asked for all 49 in one window; the three
#       mandated new certificates displaced exactly these three).
PRIORITY: tuple[str, ...] = (
    # (a) new this round
    "a57_sql_dml",
    "a58_avro_manifest",
    "k7_multimodal_export",
    # (b) r12 edit hits
    "k5_gif_decode",
    "a34_profile",
    "a40_agg_pushdown",
    "a30_stream_upsert_totals",
    "i12_stateful_session_timeout",
    # (c) age pool: the full r5-era tier (23)
    "a45_reused_exchange",
    "a46_scan_pruning",
    "a48_codegen_partial_agg",
    "k4_corpus_stats",
    "k4_dataset_card",
    "k4_fingerprint",
    "k4_redact",
    "k4_repetition_filter",
    "k4_text_stats",
    "k4_tfidf_terms",
    "k4_token_count",
    "k4_unigram_lm_score",
    "k6_epoch_shuffle",
    "k6_reservoir_per_group",
    "k6_weighted_sample",
    "k7_incremental_dedup",
    "k7_shard_manifest",
    "sql_group_by_all",
    "sql_in_subquery",
    "sql_named_params",
    "sql_pipe_syntax",
    "sql_scalar_subquery",
    "ts_pattern_match",
    # (d) age pool: r6-era tier, 23 of 26 (alphabetical; rest lead r13)
    "a53_cbo_join_reorder",
    "a55_observed_metrics",
    "c12_sortfree_bucketed_join",
    "g_union_by_name",
    "h15_bitwise_funcs",
    "k10_chunk_documents",
    "k10_phrase_search",
    "k1_cdc_chunk_dedup",
    "k1_span_dedup",
    "k1_substr_dedup",
    "k1_url_dedup",
    "k2_containment_pairs",
    "k2_minhash_lsh",
    "k2_ngram_jaccard",
    "k2_ppjoin",
    "k3_centroid_by_label",
    "k3_embedding_near_dup",
    "k3_int8_quantize",
    "k3_ivfpq_search",
)

# Explicit, justification-carrying deferrals (see stale_verdicts.py
# --check): queries reached by an edit since the last verdict commit
# that did NOT fit the window. Round 12 is the OPTIMIZATION round:
# its one repo-wide edit is the sources/registry.py metadata memo
# (load_table handle + register_views reuse — driver-side listing/
# schema round-trips only; the executed plans, scans, and results are
# unchanged by construction), which the static call graph correctly
# attributes to every consumer. The four edits that touched
# behavior-adjacent code (a34/a40/a30/i12) are IN the window above;
# the remaining memo-reached names are deferred on the strength of
# the in-round verification recorded in OPTIMIZATION_r12.md: the
# FULL 275/275 oracle parity sweep re-ran at sf0.01 after the memo
# landed (it caught — and the fix re-greened — the one real
# interaction, a40's read-time conf window), plus the full pytest
# suite. Window slots stay on the r11 #1 age tiers.
_MEMO_DEFERRAL = (
    "r12 metadata-memo edit (load_table/register_views); results "
    "unchanged by construction; full 275/275 oracle sweep re-ran "
    "in-round after the edit (see OPTIMIZATION_r12.md)"
)
DEFERRED: dict[str, str] = {
    name: _MEMO_DEFERRAL
    for name in (
        "a10_snapshot_lineage", "a12_time_travel", "a13_merge_upsert",
        "a14_table_stats", "a15_file_skipping", "a16_incremental_read",
        "a17_zero_copy_clone", "a18_rollback", "a19_delete_where",
        "a20_mor_delete", "a21_bloom_skipping", "a22_wap_publish",
        "a24_schema_history", "a25_change_feed", "a26_ivm_view",
        "a27_spec_history", "a29_stream_cdc_view", "a31_compaction",
        "a32_zorder_skipping", "a33_expire_orphans",
        "a35_partition_overwrite", "a36_positional_delete",
        "a37_check_constraints", "a41_cross_engine_read",
        "a47_rest_catalog", "a49_pyds_roundtrip", "a50_timestamp_travel",
        "a51_ingest_lifecycle", "a52_catalog_persistence",
        "a54_pyds_pushdown", "a56_catalog_resolved_scan",
        "i10_stream_restart_exactly_once", "i11_stream_dedup",
        "i7_stream_stream_join", "i8_stream_static_enrich",
        "i9_stream_outer_join", "j_udtf_term_expand", "k2_dup_clusters",
        "k3_contrastive_pairs", "k6_leakage_free_split",
        "k8_bloom_decontaminate", "k9_cc_bigstar",
        "k9_pagerank_dupgraph", "k9_triangle_count", "ts_ewma",
    )
}


def _load_modules():
    global _MODULES
    if _MODULES:
        return _MODULES
    from .operators import relational

    mods = [relational]
    for name in (
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "timeseries",
        "sqlsurface",
        "sampling",
        "udfs",
        "pipeline",
        "acid",
        "quality",
        "retrieval",
        "dml",
        "interop",
        "mmexport",
    ):
        try:
            mods.append(
                __import__(
                    f"lakehouse_homeserver_spark.operators.{name}",
                    fromlist=[name],
                )
            )
        except ModuleNotFoundError as e:
            # Only tolerate the module itself being absent (optional
            # extension); an import bug INSIDE a present module must
            # raise, not silently drop its queries from the registry
            # (that failure mode cost round-1 driver coverage).
            if e.name != f"lakehouse_homeserver_spark.operators.{name}":
                raise
    _MODULES = mods
    return mods


def _prioritized(names):
    rank = {n: i for i, n in enumerate(PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(PRIORITY)),))


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _load_modules():
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    # Dict insertion order is the driver's verification order — emit
    # PRIORITY names first (see comment above), stable otherwise.
    return {n: out[n] for n in _prioritized(out)}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _load_modules():
        out.update(m.ORACLES)
    return out
