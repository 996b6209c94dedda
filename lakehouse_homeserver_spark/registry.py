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
# ROUND-11 window = 50 names, machine-derived
# (`scripts/stale_verdicts.py`, enforced by tests/test_stale_verdicts.py).
# Composition (VERDICT r10 next-round #2/#3/#5/#6) — (a) 15 new +
# (b) 6 edit hits + (c) the ENTIRE r4-era tier (25) + (d) the 4
# alphabetically-first of the 27-query r5-era tier = 50 exactly (the
# late WARC pair + BMP/A-law/GIF codecs + WebDataset shard + the WAV
# G.711 dispatch + Unicode NFC displaced k4_redact/
# k4_repetition_filter/k4_fingerprint/k4_dataset_card/k4_corpus_stats/
# a48_codegen_partial_agg/a46_scan_pruning/a45_reused_exchange from
# (d)'s tail; they carry valid r5 verdicts and lead the r12 age
# pool):
#   (a) NEW queries, never sampled (15 — the late WARC-container pair,
#       the BMP/A-law/GIF codecs, the WebDataset shard, the WAV G.711
#       dispatch, and Unicode NFC lead the list): k5_resize_real (real decode->
#       box-downsample->re-encode, replacing the deleted digest
#       stand-in k5_resize_stub — VERDICT r10 #2), k5_jpeg_decode
#       (from-spec baseline JPEG, closing the last image-codec seam —
#       r10 #3), k5_media_near_dup (mixed PNG/JPEG corpus dedup —
#       r10 #3), k4_html_extract (HTML->text extraction — r10 #6),
#       k4_html_quality_pipeline (the extract->gate composition),
#       k5_mjpeg_frames (real video frame sampling), and
#       k5_ulaw_decode (G.711 mu-law — the compressed-audio rung);
#   (b) r11 edit hits (6; stale_verdicts, call-graph): k5_png_decode /
#       k5_png_near_dup (ADVICE r10 bounded-inflate + chunk-order
#       hardening in png_decode), k5_ahash_near_dup (shares the
#       banding SQL tail refactored for the mixed oracle),
#       k4_gopher_rules (gate body factored into the shared
#       gopher_gate helper), k5_ppm_decode and k5_wav_decode (reached
#       through shared multimodal/codec helpers per the static call
#       graph — attribution is conservative-inclusive by design);
#   (c) the ENTIRE r4-era verdict-age tier (25): the TPC-H Q2-Q22
#       batch certified in r4 plus d10-d12/d3_approx/a39/ts_* — after
#       this round no verdict predates r5 (VERDICT r10 #5);
#   (d) 4 of the r5-era tier (27), alphabetical within the tie
#       (a40-a48 AQE/pushdown certs + the k4 text-quality family);
#       the remaining 23 (a45_reused_exchange, a46_scan_pruning,
#       a48_codegen_partial_agg,
#       k4_corpus_stats,
#       k4_dataset_card, k4_fingerprint, k4_redact,
#       k4_repetition_filter,
#       k4_text_stats, k4_tfidf_terms, k4_token_count,
#       k4_unigram_lm_score + the k6/k7/sql/ts members) lead the r12
#       window.
PRIORITY: tuple[str, ...] = (
    # (a) new this round (15: the four VERDICT items plus the
    # late-round additions — k4_html_quality_pipeline chains
    # extract->gate as one driver-certified query, k5_mjpeg_frames
    # upgrades the video rung to real per-frame decode, k5_ulaw_decode
    # opens the compressed-audio rung)
    # (a2) late-r11 additions: the WARC container stage in front of
    # the HTML tier (k4_warc_parse: per-record-gzip .warc.gz split +
    # WARC/HTTP parse, hash-certified lossless; k4_cc_pipeline: the
    # container->extract->gate chain as one query)
    "k4_warc_parse",
    "k4_cc_pipeline",
    "k5_bmp_decode",
    "k5_alaw_decode",
    "k5_gif_decode",
    "k5_webdataset_shard",
    "k5_wav_g711_decode",
    "k4_unicode_nfc",
    "k5_resize_real",
    "k5_jpeg_decode",
    "k5_media_near_dup",
    "k4_html_extract",
    "k4_html_quality_pipeline",
    "k5_mjpeg_frames",
    "k5_ulaw_decode",
    # (b) r11 edit hits (k4_gopher_rules: its gate body factored into
    # the shared gopher_gate helper the composition reuses)
    "k4_gopher_rules",
    "k5_png_decode",
    "k5_png_near_dup",
    "k5_ahash_near_dup",
    "k5_ppm_decode",
    "k5_wav_decode",
    # (c) age pool: the full r4-era tier (25)
    "a39_runtime_bloom_join",
    "d10_histogram",
    "d11_mode_median",
    "d12_corr_covar",
    "d3_approx_count_distinct",
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
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "ts_attribution_join",
    "ts_sliding_hll",
    "ts_zscore_anomaly",
    # (d) age pool: r5-era tier, 4 of 27 (alphabetical; rest lead r12)
    "a40_agg_pushdown",
    "a42_aqe_skew_join",
    "a43_aqe_join_conversion",
    "a44_aqe_coalesce",
)

# Explicit, justification-carrying deferrals (see stale_verdicts.py
# --check): queries reached by an edit since the last verdict commit
# that did NOT fit the window. EMPTY this round — all 21 r11 hits
# (15 new + 6 edit-reached) are in the window above. The 23 unsampled
# r5-era members deferred to r12 are AGE rotation, not edit hits, so
# they carry valid (if old) verdicts and do not belong here.
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
