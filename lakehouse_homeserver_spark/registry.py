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
# Re-curated for the round-5 driver run (VERDICT r4 next-round #1:
# 177/245 queries hold a driver verdict after r1-r4; 68 have never
# been sampled). This 50-slot window:
#   (a) the ten a41-a50 plan-fact/format certifications whose SURVEY
#       rows claimed driver status they did not have (top of the r4
#       brief), plus a40 (same family, also never sampled) and the
#       NEW a51 ingest-lifecycle cert (r4 brief #7);
#   (b) re-samples of the two queries r5 CHANGED, whose r3 verdicts
#       are stale against the new code: k3_semdedup (bounded trained
#       codebook, r4 brief #3) and i8_stream_static_enrich (parquet
#       sink, r4 brief #4);
#   (c) the streaming/temporal certs i9/i10/i2_sliding/ts_pattern/
#       c7_asof_tolerance named by the brief;
#   (d) the sql_* dialect forms, j_* UDF surface, the whole k4 text
#       tier, the k6 sampler tier, and the k7 pipeline pair.
# Round 6's window = the 18 deferred never-sampled queries (k1/k2/k3
# variants whose families hold multiple driver verdicts, k5 metadata
# stubs, k8's exact twin, g/h one-liners, k10_chunk/phrase pair) PLUS
# the queries r5 ADDED after this window was frozen:
# a52_catalog_persistence, a53_cbo_join_reorder, k10_hybrid_rrf,
# i11_stream_dedup, a54_pyds_pushdown, a55_observed_metrics,
# c12_sortfree_bucketed_join. All keep exact parity in the local pytest mirror
# meanwhile (250/250 as of r5).
PRIORITY: tuple[str, ...] = (
    # (a) plan-fact / format / lifecycle certifications
    "a40_agg_pushdown",
    "a41_cross_engine_read",
    "a42_aqe_skew_join",
    "a43_aqe_join_conversion",
    "a44_aqe_coalesce",
    "a45_reused_exchange",
    "a46_scan_pruning",
    "a47_rest_catalog",
    "a48_codegen_partial_agg",
    "a49_pyds_roundtrip",
    "a50_timestamp_travel",
    "a51_ingest_lifecycle",
    # (b) r5-changed queries needing fresh verdicts
    "k3_semdedup",
    "i8_stream_static_enrich",
    # (c) streaming / temporal certs
    "i9_stream_outer_join",
    "i10_stream_restart_exactly_once",
    "i2_sliding_window",
    "ts_pattern_match",
    "c7_asof_tolerance",
    # (d) never-driver-verified breadth
    "sql_in_subquery",
    "sql_scalar_subquery",
    "sql_pipe_syntax",
    "sql_group_by_all",
    "sql_named_params",
    "j_normalize_embeddings",
    "j_udtf_term_expand",
    "j_arrow_batch_norms",
    "k4_text_stats",
    "k4_quality_score",
    "k4_token_count",
    "k4_fingerprint",
    "k4_corpus_stats",
    "k4_redact",
    "k4_repetition_filter",
    "k4_tfidf_terms",
    "k4_unigram_lm_score",
    "k4_hashed_classifier",
    "k4_bpe_token_count",
    "k4_dsir_importance",
    "k4_bigram_lm_score",
    "k4_dataset_card",
    "k6_stratified_sample",
    "k6_uniform_sample",
    "k6_reservoir_per_group",
    "k6_weighted_sample",
    "k6_domain_mix",
    "k6_temperature_resample",
    "k6_epoch_shuffle",
    "k7_incremental_dedup",
    "k7_shard_manifest",
)


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
