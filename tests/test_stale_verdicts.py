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
