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
# Re-curated for the round-4 driver run (VERDICT r3 next-round #1:
# 128/228 queries hold a driver verdict after r1-r3; 100 have never
# been sampled and one stale red remains). This 50-slot window:
#   (a) the stale red: d3_approx_count_distinct (r1 `no_oracle`;
#       oracle added in r2, pass-local ever since, never re-sampled);
#   (b) the round-4 additions that certify plan facts / hygiene work
#       (DPP, runtime bloom join, bucketed read-side) — each also
#       never sampled by construction;
#   (c) 46 never-driver-verified slots chosen for family value: ALL
#       18 remaining TPC-H queries, the ACID a14-a28 tail (the
#       2,141-LoC snapshot layer's biggest unverified asset, VERDICT
#       r3 #5), the ts_* analytics tail, the d1x sketch/stat aggs,
#       and the graph/pagerank K-variants.
# The ~54 still-never-sampled queries (k4_* scores, k6_* samplers,
# j_* UDF surface, k10 retrieval variants, sql_* dialect forms) are
# round 5's window; all keep exact parity in the local pytest mirror
# of the driver check meanwhile.
PRIORITY: tuple[str, ...] = (
    # (a) the one stale red in the latest-verdict view
    "d3_approx_count_distinct",
    # (b) round-4 additions
    "a38_dynamic_partition_pruning",
    "a39_runtime_bloom_join",
    "c10_bucketed_join_read",
    # (c) never-driver-verified breadth
    # -- all 17 remaining TPC-H queries
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_relationship",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_pricing",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    # -- ACID a14-a28 tail (snapshot layer)
    "a14_table_stats",
    "a15_file_skipping",
    "a16_incremental_read",
    "a17_zero_copy_clone",
    "a18_rollback",
    "a20_mor_delete",
    "a21_bloom_skipping",
    "a23_expectations",
    "a24_schema_history",
    "a28_volume_freshness",
    # -- ts_* analytics tail
    "ts_ewma",
    "ts_interpolate",
    "ts_gap_fill",
    "ts_zscore_anomaly",
    "ts_sliding_hll",
    "ts_lttb_downsample",
    "ts_m4_downsample",
    "ts_rollup_day_hour",
    "ts_attribution_join",
    # -- sketch / stat aggregates + analytic suite
    "d10_histogram",
    "d11_mode_median",
    "d12_corr_covar",
    "d14_heavy_hitters",
    "d16_histogram_quantiles",
    "e4_analytic_suite",
    # -- graph + recall K-variants
    "k9_cc_bigstar",
    "k9_pagerank_dupgraph",
    "k3_ivf_recall",
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
