"""AQE plan facts must hold at MORE than one scale factor.

VERDICT r4 #6: a42/a43/a44 pin runtime-adaptive behavior (skew-join
split, SMJ→BHJ conversion, partition coalescing) under thresholds
tuned while developing at sf0.01 — but AQE decisions are
DATA-DEPENDENT, so a threshold that only fires at one SF is a false
certificate: shift the data 10× and the plan silently stops being
the one the hash claims to certify. These tests run the same three
queries at every available fixture scale (sf0.001 / sf0.01 / sf0.1 —
a 100× spread) and assert the hashed plan-fact booleans stay TRUE,
proving the thresholds are scale-robust, not fixture-tuned.

(The oracle-value side of these queries is covered by the parity
mirror / driver window; here only the plan facts are asserted, which
is exactly the part that could flap with data size.)
"""

from __future__ import annotations

import os

import pytest

from lakehouse_homeserver_spark.operators.relational import QUERIES

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


def _facts(spark, name: str, sf_dir: str, cols: list[str]) -> dict:
    row = QUERIES[name](spark, sf_dir).select(*cols).head()
    return {c: row[c] for c in cols}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_a42_skew_split_holds_across_sf(spark, sf_dir):
    facts = _facts(
        spark,
        "a42_aqe_skew_join",
        sf_dir,
        ["skew_split", "sort_merge_join"],
    )
    assert facts == {"skew_split": True, "sort_merge_join": True}, (
        f"{sf_dir}: AQE skew-join facts flipped: {facts}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_a43_join_conversion_holds_across_sf(spark, sf_dir):
    facts = _facts(
        spark,
        "a43_aqe_join_conversion",
        sf_dir,
        [
            "final_broadcast_join",
            "initial_sort_merge_join",
            "local_shuffle_read",
        ],
    )
    assert all(facts.values()), (
        f"{sf_dir}: AQE join-conversion facts flipped: {facts}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_a44_coalesce_holds_across_sf(spark, sf_dir):
    facts = _facts(spark, "a44_aqe_coalesce", sf_dir, ["coalesced_read"])
    assert facts == {"coalesced_read": True}, (
        f"{sf_dir}: AQE coalesce fact flipped: {facts}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_a53_cbo_reorder_holds_across_sf(spark, sf_dir):
    """CBO reorder is also data-dependent (costs come from ANALYZE'd
    rowCounts, which scale with SF) — same multi-SF discipline as the
    AQE facts: the reorder and its CBO-off differential must hold at
    every fixture scale."""
    facts = _facts(
        spark,
        "a53_cbo_join_reorder",
        sf_dir,
        ["cbo_stats_available", "join_reordered", "baseline_not_reordered"],
    )
    assert all(facts.values()), f"{sf_dir}: CBO facts flipped: {facts}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_c12_sortfree_join_holds_across_sf(spark, sf_dir):
    """The zero-sort-zero-shuffle facts depend on layout (one file per
    bucket + the ordering opt-in), not data volume — but the layout is
    produced by a write path whose task/bucket alignment must hold at
    every scale; pin it across the 100× fixture spread."""
    facts = _facts(
        spark,
        "c12_sortfree_bucketed_join",
        sf_dir,
        ["sort_merge_join", "join_zero_shuffle", "join_zero_sort"],
    )
    assert all(facts.values()), f"{sf_dir}: c12 facts flipped: {facts}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_a54_pushdown_facts_hold_across_sf(spark, sf_dir):
    """VERDICT r5 #5: a54's planned-file facts (1/1/0 of 4) derive
    from a 4-file fixture; the fixture is nation-based (SF-invariant
    content) but the query accepts any sf_dir, so pin the facts at
    every fixture scale the way the AQE certs are pinned — the driver
    sampling must not be able to flake on a layout assumption."""
    from lakehouse_homeserver_spark.operators.acid import (
        QUERIES as ACID_QUERIES,
    )

    row = (
        ACID_QUERIES["a54_pyds_pushdown"](spark, sf_dir)
        .select(
            "n_files_total",
            "n_files_scanned",
            "n_files_point_lookup",
            "empty_scan_zero",
        )
        .head()
    )
    assert (
        row.n_files_total,
        row.n_files_scanned,
        row.n_files_point_lookup,
        row.empty_scan_zero,
    ) == (4, 1, 1, True), f"{sf_dir}: a54 pushdown facts flipped: {row}"
