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
# Re-curated for the round-2 driver run: with ~200 oracle-backed
# queries and a 50-slot budget, the window is chosen to put a
# driver-green row on a representative of EVERY §2 family — the
# relational core (re-verified fresh this round), each join variant,
# windows/frames, set ops, scalar-function families, streaming
# batch-twins, all four pandas-UDF forms, every K-family pipeline
# stage, and the ACID table layer including the round-2 additions
# (change feed, IVM view, spec history). Everything outside the
# window keeps its exact-comparison coverage in local pytest parity
# (the same spark-vs-DuckDB check the driver runs).
PRIORITY: tuple[str, ...] = (
    # relational core — one per §2 row
    "q1_pricing_summary",          # D2 grouped aggs (+A1 scan)
    "b_filter_predicates",         # B1/B5 filters
    "c1_join_revenue_by_nation",   # C1 inner + C5 broadcast
    "c2_join_full_outer",          # C2 outer
    "c3_join_anti",                # C3 semi/anti
    "c4_theta_join",               # C4 theta
    "c6_range_join_bucketized",    # C6 range→equi conversion
    "d4_rollup",                   # D4 rollup/cube
    "d7_quantiles_approx",         # D7 (r1 driver err — prove fixed)
    "e1_window_rank",              # E1 ranking
    "e2_window_lag_lead",          # E2 analytic
    "e3_window_range_frame",       # E3 RANGE frame
    "f2_sort_limit",               # F2/F3 order+limit
    "f4_topk_per_group",           # F4 top-k
    "g_except_all",                # G set ops (bag semantics)
    "h1_interval_arith",           # H1 ts arithmetic
    # scalar-function families
    "h6_array_funcs",              # H6 arrays
    "h8_json_funcs",               # H8 JSON (events.props, nanos ts)
    "h13_variant",                 # H-ext VARIANT
    # SQL surface
    "tpch_q5_local_supplier_volume",
    "sql_exists_correlated",
    "sql_grouping_sets",
    # time-series / streaming batch-twins
    "c7_asof_join",
    "i2_tumbling_window",
    "ts_sessionize",
    # join extensions
    "c11_scd2_join",
    "c9_fuzzy_join",
    # mergeable sketches
    "d13_bitmap_distinct",
    "d15_count_min",
    # pandas-UDF forms
    "j_grouped_agg_mad",
    "j_label_dispersion",
    "j_cogroup_medians",
    # K1/K2 dedup
    "k1_dedup_exact_keep",
    "k2_minhash_lsh",
    "k2_ppjoin",
    # K3 similarity
    "k3_knn_bruteforce",
    "k3_ivfpq_search",
    # K4 text
    "k4_gopher_rules",
    "k4_bpe_train",
    # K5 multimodal
    "k5_ppm_decode",
    "k5_ahash_near_dup",
    # K6/K7 sampling + composed pipeline
    "k6_hash_split",
    "k7_training_corpus",
    # retrieval
    "k10_bm25",
    # ACID table layer
    "a10_snapshot_lineage",
    "a12_time_travel",
    "a13_merge_upsert",
    "a25_change_feed",
    "a26_ivm_view",
    "a27_spec_history",
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
