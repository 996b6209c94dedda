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
# ROUND-10 window = 50 names, machine-derived
# (`scripts/stale_verdicts.py`, enforced by tests/test_stale_verdicts.py).
# Composition (VERDICT r9 next-round #2 and #6) — (a) 2 new + (b) 3
# edit hits + (c) 26 r2-era + (d) 19 r3-era = 50 exactly, the full
# driver budget:
#   (a) the round's NEW queries: k5_png_decode (real PNG decode —
#       zlib inflate + 5-filter unapply — closing the compressed-
#       codec seam, VERDICT r9 #4) and k5_png_near_dup (the composed
#       compressed-media dedup pipeline); never sampled, lead the
#       window;
#   (b) the r10 edit hits: k5_ppm_decode (shares multimodal.py's
#       edited decode helpers with the new PNG section),
#       a54_pyds_pushdown (reached by the pyds.py `_file_seq`
#       empty-map conformance fix, ADVICE r9 #1-#2 — result-neutral
#       for well-formed engine logs, but edited-is-edited), and
#       k5_ahash_near_dup (kernel/oracle factored into shared
#       helpers);
#   (c) the ENTIRE r2-era verdict-age tier (26) — including the
#       flagship q1_pricing_summary, tpch_q5, e1_window_rank,
#       h8_json_funcs, f2_sort_limit, f4_topk_per_group,
#       c2_join_full_outer, d7_quantiles_approx, and the K/J-family
#       members the judge listed explicitly so the LLM-pipeline tier
#       keeps its rotation slots (VERDICT r9 #6): k3_knn_bruteforce,
#       k1_dedup_exact_keep, k4_gopher_rules, j_grouped_agg_mad,
#       j_label_dispersion, j_cogroup_medians;
#   (d) the ENTIRE r3-era tier (19). After the r10 driver run no
#       verdict predates r4 (<= 6 rounds old), and the next-oldest
#       tier (25 r4-era, mostly the TPC-H batch certified in r4)
#       fits inside one further window.
# NO mass-touch refactors landed this round — the only package edits
# are the PNG section in multimodal.py and the pyds.py seq-map
# conformance fix.
PRIORITY: tuple[str, ...] = (
    # (a) new this round: the PNG decode cert + the composed
    # compressed-media near-dup pipeline built on it
    "k5_png_decode",
    "k5_png_near_dup",
    # (b) r10 edit hits (k5_ahash_near_dup: its kernel tail + oracle
    # pairs-SQL were factored into helpers shared with the new PNG
    # pipeline — result-neutral, but edited-is-edited)
    "k5_ppm_decode",
    "a54_pyds_pushdown",
    "k5_ahash_near_dup",
    # (c) age pool: the full r2-era tier (26)
    "c2_join_full_outer",
    "c3_join_anti",
    "c4_theta_join",
    "c6_range_join_bucketized",
    "d13_bitmap_distinct",
    "d4_rollup",
    "d7_quantiles_approx",
    "e1_window_rank",
    "e2_window_lag_lead",
    "e3_window_range_frame",
    "f2_sort_limit",
    "f4_topk_per_group",
    "g_except_all",
    "h13_variant",
    "h1_interval_arith",
    "h8_json_funcs",
    "j_cogroup_medians",
    "j_grouped_agg_mad",
    "j_label_dispersion",
    "k1_dedup_exact_keep",
    "k3_knn_bruteforce",
    "k4_gopher_rules",
    "q1_pricing_summary",
    "sql_exists_correlated",
    "sql_grouping_sets",
    "tpch_q5_local_supplier_volume",
    # (d) age pool: the full r3-era tier (19)
    "a34_profile",
    "d17_theta_sketch_setops",
    "d18_topn_plus_others",
    "d3_hll_sketch_merge",
    "d8_pivot",
    "f5_keyset_pagination",
    "h10_try_funcs",
    "h11_null_semantics",
    "h14_url_funcs",
    "h16_xml_funcs",
    "k5_frame_sample",
    "k6_hash_split",
    "k7_sequence_packing",
    "sql_lateral_join",
    "sql_recursive_month_spine",
    "tpch_q12_priority_by_status",
    "tpch_q3_shipping_priority",
    "ts_funnel",
    "ts_interval_merge",
)

# Explicit, justification-carrying deferrals (see stale_verdicts.py
# --check): queries reached by an edit since the last verdict commit
# that did NOT fit the window. EMPTY this round - all 6 r9 edit hits
# and all 8 r8 deferrals are in the window above.
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
