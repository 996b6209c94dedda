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
# ROUND-7 window = exactly 50 names, composition:
#   (a) the 14 deferred r6-edit re-samples (VERDICT r6 what's-wrong
#       #1): the 9 own-body/oracle edits (k3_kmeans/knn_ivf/semdedup,
#       the k4 text family) + k3_ivf_recall (ivf_train threading) +
#       the 4 shared-path ACID certs (a16/a25/a22/a35) +
#       k9_triangle_count (verified-pairs consumer);
#   (b) the 35 queries edited THIS round by the ADVICE fixes
#       (restcat sidecar path -> a47/a52/a56; fingerprint scheme ->
#       a50 + the duppairs-fixture consumers k2_dup_clusters /
#       k9_cc_bigstar / k9_pagerank_dupgraph) and the four
#       adversarial review batches (retrieval/sampling/multimodal/
#       timeseries/sqlsurface/relational — NULL-payload kernels,
#       floor bucketing, EWMA NULLIF, LTTB decimal sums, q22 davg,
#       d16 oracle typing, h12 bigint, the c10 bucketed pair, the
#       shared-helper consumers k6_uniform/stratified/temperature/
#       domain_mix/leakage_free, c7 asof pair, ts_rollup view fix).
#   Zero spare slots remain for rolling re-certification this round —
#   the 30 r1-era verdicts are the r8 window's (2) pool, oldest
#   first. The registry-wide make_registry() consolidation (r7) is
#   registration machinery, not query bodies: result-neutral,
#   covered by the full local 256/256 parity sweeps.
PRIORITY: tuple[str, ...] = (
    # (a) deferred r6-edit re-samples
    "a16_incremental_read",
    "a25_change_feed",
    "a22_wap_publish",
    "a35_partition_overwrite",
    "k9_triangle_count",
    "k3_kmeans",
    "k3_knn_ivf",
    "k3_ivf_recall",
    "k3_semdedup",
    "k4_lang_id",
    "k4_quality_score",
    "k4_hashed_classifier",
    "k4_bigram_lm_score",
    "k4_dsir_importance",
    "k4_bpe_token_count",
    # (b) r7 ADVICE-fix re-samples
    "a47_rest_catalog",
    "a52_catalog_persistence",
    "a56_catalog_resolved_scan",
    "a50_timestamp_travel",
    "k2_dup_clusters",
    "k9_cc_bigstar",
    "k9_pagerank_dupgraph",
    # (b) r7 review-fix re-samples: retrieval
    "k10_bm25",
    "k10_hybrid_rrf",
    "k10_inverted_index",
    # (b) multimodal kernels
    "k5_multimodal_features",
    "k5_resize_stub",
    "k5_wav_decode",
    "k5_ahash_near_dup",
    # (b) sampling (uniform/leakage_free/domain_mix deferred: helper
    # reuse is bit-identical IEEE / identical expressions, domain_mix
    # is plan-only localCheckpoint — all local-parity-proven)
    "k6_stratified_sample",
    "k6_temperature_resample",
    # (b) timeseries + asof
    "ts_ewma",
    "ts_cohort_retention",
    "ts_lttb_downsample",
    "ts_rollup_day_hour",
    "c7_asof_join",
    "c7_asof_tolerance",
    # (b) sqlsurface + relational
    "tpch_q22_idle_customers",
    "d16_histogram_quantiles",
    "c10_bucketed_join",
    "c10_bucketed_join_read",
    # (c) r7 review batch 4 (acid/pyds/streaming) re-samples — these
    # displaced six provably-value-identical refactor-class entries
    # (ts_gap_fill/ts_interpolate/ts_m4 floor==trunc for the
    # fixture's positive epochs, h12 cast-width only, k5_ppm/pcm
    # fixture-unreachable NULL guards; all hold local 256/256 parity
    # and are r8's first re-cert candidates alongside the r1-era
    # pool):
    "i12_stateful_session_timeout",
    "a29_stream_cdc_view",
    "a30_stream_upsert_totals",
    "i2_tumbling_window",
    "a49_pyds_roundtrip",
    "a54_pyds_pushdown",
    # (d) r7 review batch 5 (ingest/ivm/restcat/quality/udfs)
    # re-samples: the IVM merge gained null-safe keys + the
    # zero-group filter on first refresh, a28's oracle NULL-max
    # semantics changed, arrow-batch norms derive dim in-batch
    "a26_ivm_view",
    "a28_volume_freshness",
    "j_arrow_batch_norms",
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
