"""Persistent-fixture janitor (VERDICT r5 next-round #7).

The plan-fact / format certification queries memoize deterministic
fixtures at fixed /tmp paths (cross-process flock + sentinel,
`operators/acid._build_fixture_once`) so bench sweeps measure the
READ, not the fixture build. The price is /tmp state that outlives
any one process — this script keeps that state enumerable:

- every live fixture family is listed in KNOWN below; a /tmp dir
  matching the `lakehouse-*` namespace but NO live pattern is a
  legacy leftover from an older fixture-tag scheme and is removed;
- tstravel fixtures are content-fingerprinted (acid._source_fingerprint):
  tags whose fingerprint no longer matches the current testdata are
  stale and removed;
- everything kept is printed with its size, so "fixture set stays
  enumerable" is checkable at a glance.

Usage: python scripts/fixture_janitor.py [--dry-run]
Exit code 0 always (a janitor must never fail the build); stale
removals are printed.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_homeserver_spark.operators.acid import (  # noqa: E402
    FIXTURE_FAMILIES_FINGERPRINTED,
    FIXTURE_FAMILIES_FIXED,
    _source_fingerprint,
)

TMP = "/tmp"
SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.environ.get("SPARK_GRAFT_SF_DIR", ""),
    )
    if d and os.path.isdir(d)
]

# Both family lists come from the operators' own registry
# (operators/acid.py FIXTURE_FAMILIES_*), so a family added there is
# automatically known here — the ADVICE r6 failure mode was a new
# family being rmtree'd mid-use because these lists were hardcoded
# copies.
FIXED = FIXTURE_FAMILIES_FIXED
FINGERPRINTED = FIXTURE_FAMILIES_FINGERPRINTED

# Per-run SCRATCH dirs (r7 review): streaming/ACID certs mkdtemp a
# landing dir + checkpoint + sink per run and cannot delete them in
# the query body (the returned DataFrame still reads the sink when
# the driver materializes it), so repeated sweeps accumulate
# thousands of dirs. Every scratch mkdtemp in this project uses the
# single project-unique prefix below (r8 advice — the old loose
# prefixes like 'snap-'/'i7-' matched OTHER tools' /tmp dirs and the
# sweep could delete them); the janitor reaps only that namespace
# once a dir is old enough that no live sweep can still be reading
# it (default 2 h; a full 256-query sweep is ~6 min).
SCRATCH_PREFIXES = ("lakehouse-scratch-",)
# r10 (ADVICE r9 #4): the r9 one-round deprecated legacy-prefix sweep
# is RETIRED as scheduled. Every scratch mkdtemp site has used the
# namespaced prefix for two rounds, /tmp was manually confirmed clean
# of the pre-namespacing stems in both r9 and r10, and several of the
# retired stems ("i10-", "sf-scaled-") were generic enough to match
# unrelated software's /tmp dirs — the hazard class the namespacing
# removed. Any pre-r9 stragglers are plain /tmp dirs for the OS tmp
# reaper; this janitor only ever touches its own namespace again.
SCRATCH_MAX_AGE_S = float(
    os.environ.get("SPARK_GRAFT_SCRATCH_MAX_AGE_S", str(2 * 3600))
)


def live_fingerprinted_tags() -> set[str]:
    """Dir names the CURRENT testdata would produce for every
    fingerprinted family."""
    out = set()
    for sf_dir in SF_DIRS:
        sf = os.path.basename(sf_dir.rstrip("/"))
        for prefix, table in FINGERPRINTED.items():
            try:
                fp = _source_fingerprint(sf_dir, table)
            except FileNotFoundError:
                # This sf_dir lacks the family's source table (e.g. a
                # custom SPARK_GRAFT_SF_DIR with a subset of tables) —
                # the family simply can't be live for it. Skip the
                # tag; don't abort the whole sweep (r8 advice).
                continue
            out.add(f"{prefix}{sf}-{fp}")
    return out


def main() -> None:
    dry = "--dry-run" in sys.argv
    live = FIXED | live_fingerprinted_tags()
    kept, removed, unknown = [], [], []
    for name in sorted(os.listdir(TMP)):
        if not name.startswith("lakehouse-"):
            continue
        if name.startswith(SCRATCH_PREFIXES):
            continue  # per-run scratch: age-based sweep below owns it
        path = os.path.join(TMP, name)
        if name in live:
            kept.append(path)
            continue
        # Fingerprinted families are keyed by sf-basename + content
        # fingerprint: only remove ones whose BASENAME we actually
        # scanned (their fingerprint mismatched => stale) or whose
        # name predates the fingerprint scheme (no trailing -<10hex>).
        # A fixture built from an sf_dir this run doesn't know about
        # (other SPARK_GRAFT_SF_DIR, a concurrent process) is LIVE to
        # someone else — leave it and report it.
        fam = next((f for f in FINGERPRINTED if name.startswith(f)), None)
        if fam is not None:
            rest = name[len(fam) :]
            scanned = {
                os.path.basename(d.rstrip("/")) for d in SF_DIRS
            }
            m = re.fullmatch(r"(.+)-([0-9a-f]{10})", rest)
            sf_base = m.group(1) if m else rest
            if m and sf_base not in scanned:
                unknown.append(path)
                continue
        elif name not in FIXED:
            # Not a registered family at all: REPORT, never delete
            # (ADVICE r6 — a family added without registering in
            # acid.FIXTURE_FAMILIES_* must not be rmtree'd mid-use;
            # the registry import above makes registration the only
            # step, and this branch is the safety net if it's missed).
            unknown.append(path)
            continue
        removed.append(path)
        if not dry:
            shutil.rmtree(path, ignore_errors=True)
    # Scratch dirs from per-call mkdtemp queries (i7/i8/…-prefixed)
    # self-clean per tmpdir policy; report any unusually large strays.
    print("== kept (live fixture families) ==")
    for p in kept:
        du = subprocess.run(
            ["du", "-sh", p], capture_output=True, text=True
        ).stdout.split("\t")[0]
        print(f"  {du:>8s}  {p}")
    print(f"== removed ({'dry-run, would remove' if dry else 'deleted'}) ==")
    for p in removed:
        print(f"  {p}")
    if not removed:
        print("  (none)")
    if unknown:
        print("== left alone (unregistered family or built from an sf_dir not scanned here) ==")
        for p in unknown:
            print(f"  {p}")
    # -- scratch sweep: per-run cert dirs past the safe age ----------
    import time

    now = time.time()
    n_scratch, n_kept_young = 0, 0
    for name in os.listdir(TMP):
        if not name.startswith(SCRATCH_PREFIXES):
            continue
        path = os.path.join(TMP, name)
        try:
            age = now - os.stat(path).st_mtime
        except OSError:
            continue
        if age < SCRATCH_MAX_AGE_S:
            n_kept_young += 1
            continue
        n_scratch += 1
        if not dry:
            shutil.rmtree(path, ignore_errors=True)
    print(
        f"== scratch sweep: {n_scratch} dirs older than "
        f"{SCRATCH_MAX_AGE_S / 3600:.1f}h "
        f"{'would be ' if dry else ''}removed, {n_kept_young} younger kept =="
    )
    # -- warehouse sweep: bucketed tables built from scale-smoke
    # clone dirs (tag sf_scaled_<mkdtemp suffix>) can never be reused
    # once their source dir is gone; reap them on the same age rule.
    wh = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
        "bucketed.db",
    )
    n_wh = 0
    if os.path.isdir(wh):
        for name in os.listdir(wh):
            if "_sf_scaled_" not in f"_{name}":
                continue
            path = os.path.join(wh, name)
            try:
                if now - os.stat(path).st_mtime < SCRATCH_MAX_AGE_S:
                    continue
            except OSError:
                continue
            n_wh += 1
            if not dry:
                shutil.rmtree(path, ignore_errors=True)
    print(
        f"== warehouse sweep: {n_wh} stale scale-clone bucketed tables "
        f"{'would be ' if dry else ''}removed =="
    )


if __name__ == "__main__":
    main()
