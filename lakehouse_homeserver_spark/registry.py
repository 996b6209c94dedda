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
# Re-curated for the round-3 driver run (VERDICT r2 next-round #3:
# "rotate the window to never-verified queries"). 82 distinct queries
# hold a driver verdict from r1+r2; this 50-slot window is built as:
#   (a) the 10 queries whose oracles carried the HUGEINT type defect,
#       now CAST-fixed — the 3 red r2 rows MUST re-verify green;
#   (b) the round-3 additions (streaming-certifying ACID queries,
#       newly-oracled exact-mode IVF, compaction / z-order / GC /
#       profiling maintenance surface);
#   (c) 1 canary re-verifying the already-green core;
#   (d) 28 never-driver-verified slots: breadth across every family
#       that has zero driver-green rows (scalar H*, sketch/agg D*,
#       window/sort, TPC-H + SQL surface, ts_*, K-variants, ACID
#       mutations) plus the late-round-3 additions (bloom decon,
#       positional deletes, CHECK constraints, stream-static join,
#       bucketed zero-shuffle join) — each funded by dropping an
#       entry whose family already holds multiple green rows.
# Everything outside the window keeps exact-comparison coverage in
# the local pytest parity suite (now routed through pandas dtypes,
# i.e. the driver's own canonicalization).
PRIORITY: tuple[str, ...] = (
    # (a) HUGEINT-defect fixes — red r2 rows first
    "ts_sessionize",
    "k4_bpe_train",
    "k6_hash_split",
    "k10_inverted_index",
    "k5_wav_decode",
    "k5_pcm_frames",
    "k7_sequence_packing",
    "tpch_q12_priority_by_status",
    "ts_interval_merge",
    "ts_rich_sessions",
    # (b) round-3 additions
    "a29_stream_cdc_view",
    "a30_stream_upsert_totals",
    "k3_knn_ivf",
    "k1_substr_dedup",
    "a31_compaction",
    "a32_zorder_skipping",
    "a33_expire_orphans",
    "a34_profile",
    "a35_partition_overwrite",
    "i7_stream_stream_join",
    "k3_kmeans",
    # (c) canary — keep a fresh verdict on the green core
    # (e1_window_rank / k1_dedup_exact_keep / q1 rotated out after
    # two green rounds to fund the (b) additions at a fixed 50 slots;
    # q1 is still smoke-checked every round via entry())
    "a12_time_travel",
    # (d) never-driver-verified breadth
    "h10_try_funcs",
    "h11_null_semantics",
    "h12_higher_order_funcs",
    "h14_url_funcs",
    "h16_xml_funcs",
    "d3_hll_sketch_merge",
    "d8_pivot",
    "k8_bloom_decontaminate",
    "a37_check_constraints",
    "a36_positional_delete",
    "d17_theta_sketch_setops",
    "d18_topn_plus_others",
    "f5_keyset_pagination",
    "i8_stream_static_enrich",
    "tpch_q3_shipping_priority",
    "c10_bucketed_join",
    "sql_recursive_month_spine",
    "sql_lateral_join",
    "ts_funnel",
    "ts_cohort_retention",
    "k2_dup_clusters",
    "k9_triangle_count",
    "k3_semdedup",
    "k4_lang_id",
    "k5_frame_sample",
    "k6_leakage_free_split",
    "a19_delete_where",
    "a22_wap_publish",
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
