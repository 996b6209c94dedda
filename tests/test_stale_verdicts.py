"""Window-curation gate (VERDICT r7 next-round #1): the driver
samples the first ~50 registry entries each round; every query
REACHED by an edit since the last verdict commit must be in that
window (registry.PRIORITY) or explicitly deferred with justification
(registry.DEFERRED). scripts/stale_verdicts.py derives the set
mechanically (git diff -> decorator-inclusive ast spans -> static
call graph); this test makes hand-listing impossible to regress to.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_every_edited_query_is_windowed_or_deferred():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "stale_verdicts.py"),
         "--check"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]


def test_decorator_hunks_attribute_to_the_decorated_def():
    """The exact trap the r7 judge hit: a hunk inside a
    @query(oracle=...) block sits BELOW the previous def in raw git
    hunk-context terms, but belongs to the DECORATED function. Spans
    must include decorator lines."""
    import ast

    from stale_verdicts import _ModuleIndex

    src = '''\
def previous_query(spark, sf):
    return 1


@query(
    "next_query",
    oracle="""
    SELECT changed_line_here
    """,
)
def next_query(spark, sf):
    return 2
'''
    idx = _ModuleIndex("m")
    idx.visit(ast.parse(src))
    prev = idx.defs["m::previous_query"]
    nxt = idx.defs["m::next_query"]
    oracle_line = src.splitlines().index("    SELECT changed_line_here") + 1
    assert nxt[0] <= oracle_line <= nxt[1], "oracle hunk outside next span"
    assert not (prev[0] <= oracle_line <= prev[1]), (
        "oracle hunk wrongly inside the previous def's span"
    )


def test_module_level_assign_flags_only_referencing_defs():
    """A changed module-level constant flags the defs that READ it,
    not the whole module; decorator registration machinery (`query`)
    is excluded from refs so registry-factory churn can't flood."""
    import ast

    from stale_verdicts import _ModuleIndex

    src = '''\
THRESHOLD = 5
OTHER = 7


@query("uses_threshold")
def uses_threshold(spark, sf):
    return THRESHOLD


@query("ignores_threshold")
def ignores_threshold(spark, sf):
    return OTHER
'''
    idx = _ModuleIndex("m")
    idx.visit(ast.parse(src))
    assert "THRESHOLD" in idx.refs["m::uses_threshold"]
    assert "THRESHOLD" not in idx.refs["m::ignores_threshold"]
    assert "query" not in idx.refs["m::uses_threshold"]
    # the assignment span is recorded for the module-level-hunk rule
    assert any("THRESHOLD" in names for _, _, names in idx.toplevel_assigns)


def test_ambiguous_attr_edges_need_an_import():
    """`list.append` in a module that never imports the snapshot
    layer must NOT create an edge to SnapshotTable.append — the
    precision guard that keeps the hit set windowable."""
    from stale_verdicts import build_edges, build_index

    defs, refs, idx_of_file, terminal = build_index()
    edges = build_edges(defs, refs, idx_of_file, terminal)
    snap_append = (
        "lakehouse_homeserver_spark.sources.snapshot::"
        "SnapshotTable::append"
    )
    assert snap_append in defs
    # text.py uses list.append but does not import the snapshot layer
    text_fns = [q for q in edges if q.startswith(
        "lakehouse_homeserver_spark.operators.text::")]
    assert text_fns
    offenders = [q for q in text_fns if snap_append in edges[q]]
    assert not offenders, offenders
    # acid.py DOES import SnapshotTable: its WAP cert keeps the edge
    wap = "lakehouse_homeserver_spark.operators.acid::a22_wap_publish"
    assert snap_append in edges[wap]


def test_window_is_exactly_the_driver_budget():
    """PRIORITY is the driver's 50-query sample; fewer wastes slots,
    more silently drops the tail out of the window."""
    from lakehouse_homeserver_spark.registry import (
        DEFERRED,
        PRIORITY,
        all_queries,
    )

    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50, "duplicate names waste slots"
    names = set(all_queries())
    unknown = [n for n in PRIORITY if n not in names]
    assert not unknown, f"PRIORITY names not in registry: {unknown}"
    unknown_d = [n for n in DEFERRED if n not in names]
    assert not unknown_d, f"DEFERRED names not in registry: {unknown_d}"
    assert not set(PRIORITY) & set(DEFERRED), "windowed AND deferred"
    assert all(DEFERRED.values()), "deferral without justification"


def test_age_mode_lists_every_registered_query():
    """--age (r9) is the window-composition companion to --check:
    every registered query appears in exactly one verdict tier, and a
    never-sampled query fails loudly UNLESS it is already in PRIORITY
    (the normal mid-round state of a new registration, certified by
    the very next driver run — r10 review: the unconditional exit-1
    kept the suite red between registering a query and the driver's
    artifact drop). Every certified query must appear in exactly one
    tier; never-sampled-and-unwindowed must be zero."""
    import re
    import subprocess

    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "stale_verdicts.py"),
         "--age"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-2000:]
    assert "(0 unwindowed)" in r.stdout
    from lakehouse_homeserver_spark.registry import PRIORITY, all_queries

    never = re.findall(r"^NEVER-SAMPLED: (\S+)", r.stdout, re.M)
    assert all(n in PRIORITY for n in never), never
    m = re.search(r"age pool: (\d+) registered", r.stdout)
    assert m and int(m.group(1)) == len(all_queries())
    tier_total = sum(
        int(n) for n in re.findall(r"^r\d+ \((\d+)\):", r.stdout, re.M)
    )
    assert tier_total == len(all_queries()) - len(never)
