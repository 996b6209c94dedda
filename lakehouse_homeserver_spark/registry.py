"""Central query registry: merges every operator module's QUERIES/ORACLES.

This is the single source of truth consumed by ``__spark_entry__.py``
(driver contract) and by the local parity tests / bench.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = []

# Driver-verification priority. The correctness harness budgets ~50
# entries per round, taken in registry order; round 1 burned the whole
# budget on `relational` and left every other family unverified
# (VERDICT.md "Next round" item 1). Names listed here are emitted
# first, in this order; everything else follows in module order.
# Window design: (a) every oracle-backed query with no driver verdict
# yet, (b) the fixed/newly-oracled approx tier, (c) new round-2 ops,
# (d) a handful of already-green relational representatives so the
# core family keeps a fresh verdict each round.
PRIORITY: tuple[str, ...] = (
    # -- similarity / text / multimodal (K3-K5), unverified in r1
    "k3_knn_bruteforce",
    "k3_centroid_by_label",
    "k3_knn_lsh",
    "k3_embedding_near_dup",
    "k4_text_stats",
    "k4_quality_score",
    "k4_lang_id",
    "k4_token_count",
    "k4_fingerprint",
    "k4_corpus_stats",
    "k5_multimodal_features",
    "k5_multimodal_meta",
    "k5_frame_sample",
    "k5_resize_stub",
    # -- time-series / streaming batch-twins, unverified in r1
    "c7_asof_join",
    "ts_sessionize",
    "i2_tumbling_window",
    "i2_sliding_window",
    "ts_gap_fill",
    "ts_rollup_day_hour",
    "ts_rich_sessions",
    # -- TPC-H + SQL-surface forms, unverified in r1
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "sql_exists_correlated",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "sql_grouping_sets",
    "d8_pivot",
    "e3_window_range_frame",
    "h1_interval_arith",
    # -- sampling / UDF / pipeline, unverified in r1
    "k6_hash_split",
    "j_label_dispersion",
    "j_grouped_agg_mad",
    "k7_training_corpus",
    # -- new round-2 pipeline ops
    "k7_sequence_packing",
    "k4_redact",
    # -- approx tier: fixed (d7) / newly oracled this round
    "d7_quantiles_approx",
    "d3_approx_count_distinct",
    "k6_uniform_sample",
    "k6_stratified_sample",
    "j_normalize_embeddings",
    "k2_simhash_near_pairs",
    # -- new round-2 operators (ACID table layer + pipeline ops).
    # These take the window slots over already-green relational
    # representatives: with more oracle-backed queries than driver
    # slots, first-time verification of novel machinery beats
    # re-verification. The round-2 TPC-H additions (q7/q8/q13/q17/
    # q21, q6/q15/q19/q22) wait for round-3 slots — they are
    # same-text SQL, so local pytest parity already runs the exact
    # comparison the driver would.
    "a10_snapshot_lineage",
    "a12_time_travel",
    "a13_merge_upsert",
    "k8_decontaminate",
    "k4_repetition_filter",
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
