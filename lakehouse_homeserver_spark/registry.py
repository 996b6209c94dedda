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
# Re-curated for the ROUND-6 driver run (VERDICT r5 next-round #1):
# after r5's 50/50-green window the distinct driver-green union was
# 225/253 with exactly 28 never-sampled queries; r6 then ADDED three
# queries (i12, a56, ts_value_spikes), so the registry is 256 and a
# fully-green r6 window reaches 253 + 3 = 256 distinct... only if
# every name below lands in the 50-slot window — it does: exactly 50
# curated names, no backfills.
#   (a) the 28 never-sampled queries: the r5-added certs
#       (a52-a55, c12, i11, k10_hybrid_rrf) and the deferred family
#       variants (k1/k2/k3 tails, k5 metadata stubs, k8's exact
#       twin, g/h one-liners, k10 chunk/phrase);
#   (b) re-samples of queries whose code CHANGED after their last
#       verdict (the r5 rule): k9_pagerank_dupgraph (r5 broadcast-
#       loop fix landed after the window froze — VERDICT r5 wrong
#       #1), k3_ivfpq_search (row-count probe swap), k2_minhash_lsh
#       (r3 numpy kernel, pytest-pinned bit-exact, never re-rode the
#       hash), and the r6 ADVICE fixes: a50 (fingerprinted fixture
#       tag), the awaitTermination-hardened streaming certs
#       (i7-i10, a29, a30);
#   (c) the three r6-added queries themselves (i12, a56,
#       ts_value_spikes). The r5 perf-weak ts_rollup_day_hour cleared
#       on the median-of-3 re-measure (BASELINE.md r6), so it gave up
#       its slot to an edited query.
PRIORITY: tuple[str, ...] = (
    # (a) never-driver-sampled — the road to 253/253
    "a52_catalog_persistence",
    "a53_cbo_join_reorder",
    "a54_pyds_pushdown",
    "a55_observed_metrics",
    "c12_sortfree_bucketed_join",
    "g_union_by_name",
    "h15_bitwise_funcs",
    "i11_stream_dedup",
    "k1_url_dedup",
    "k1_span_dedup",
    "k1_cdc_chunk_dedup",
    "k2_containment_pairs",
    "k2_simhash_near_pairs",
    "k3_centroid_by_label",
    "k3_contrastive_pairs",
    "k3_embedding_near_dup",
    "k3_int8_quantize",
    "k3_knn_lsh",
    "k3_mmr_rerank",
    "k3_pq_quantize",
    "k3_random_projection",
    "k5_multimodal_features",
    "k5_multimodal_meta",
    "k5_resize_stub",
    "k8_decontaminate",
    "k10_chunk_documents",
    "k10_hybrid_rrf",
    "k10_phrase_search",
    # (b) edited-after-verdict re-samples
    "k9_pagerank_dupgraph",
    "k3_ivfpq_search",
    "k2_minhash_lsh",
    "a50_timestamp_travel",
    "i7_stream_stream_join",
    "i8_stream_static_enrich",
    "i9_stream_outer_join",
    "i10_stream_restart_exactly_once",
    "a29_stream_cdc_view",
    "a30_stream_upsert_totals",
    "a47_rest_catalog",
    # (b-cont.) certs whose code paths the r6 review fixes touched.
    # Slots are finite (50): result-identical CHECK-only/efficiency
    # edits (a16/a25 contiguity guard, a22 constraint gate on a
    # constraint-free fixture, a35 non-NULL path, the verified-pairs
    # consumer k9_triangle_count, k3_semdedup persist, k3_kmeans
    # empty-guard, the ivf-family footer-count threading, and the
    # text-family r6 edits — k4_lang_id CSE materialization,
    # k4_quality_score constant hoist, k4_hashed_classifier NULL-text
    # coalesce, k4_bpe_token_count oracle dry-merge guard,
    # k4_bigram_lm_score hint drop — all fixture-result-identical)
    # hold local parity and defer to r7; queries whose own bodies
    # changed re-sample now.
    "a33_expire_orphans",
    "a19_delete_where",
    "k2_ngram_jaccard",
    "k1_substr_dedup",
    "k8_bloom_decontaminate",
    "k2_ppjoin",
    "k2_dup_clusters",
    "k9_cc_bigstar",
    # (c) new r6 certs
    "i12_stateful_session_timeout",
    "a56_catalog_resolved_scan",
    "ts_value_spikes",
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
