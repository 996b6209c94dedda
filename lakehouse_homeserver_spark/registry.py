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
#   (b) r12 edit hit (1): k5_gif_decode (ADVICE r11 zero-dimension
#       geometry guard added to gif_decode);
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
    # (b) r12 edit hit
    "k5_gif_decode",
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
    "k3_knn_lsh",
    "k3_mmr_rerank",
    "k3_pq_quantize",
    "k3_random_projection",
)

# Explicit, justification-carrying deferrals (see stale_verdicts.py
# --check): queries reached by an edit since the last verdict commit
# that did NOT fit the window. EMPTY this round — all 4 r12 hits
# (3 new + the gif_decode guard) are in the window above. The 3
# unsampled r6-era members deferred to r13 (k5_multimodal_meta,
# k8_decontaminate, ts_value_spikes) are AGE rotation, not edit hits,
# so they carry valid (if old) verdicts and do not belong here.
DEFERRED: dict[str, str] = {}


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
