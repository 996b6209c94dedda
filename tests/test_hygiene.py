"""Repo-hygiene invariants that keep the janitor/driver machinery
mechanical instead of hand-maintained (r8 advice + verdict #1).

These tests read SOURCE, not data — they are cheap and run first.
"""

from __future__ import annotations

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _py_sources() -> list[str]:
    out = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [
            d
            for d in dirs
            if d
            not in (".git", "__pycache__", "spark-warehouse", ".claude")
        ]
        for f in files:
            if f.endswith(".py"):
                out.append(os.path.join(root, f))
    return out


def test_scratch_mkdtemp_prefixes_are_namespaced():
    """r8 advice: the janitor's age-based scratch sweep rmtree's /tmp
    dirs by prefix. Every scratch mkdtemp/TemporaryDirectory prefix in
    the project must live under the single project-unique
    'lakehouse-scratch-' namespace, so the sweep can never match (and
    delete) another tool's /tmp dirs. Fixture families use the
    'lakehouse-' + registry naming and are exempt (they are swept by
    the registry-driven fixture pass, not by prefix age)."""
    pat = re.compile(r'(?:mkdtemp|TemporaryDirectory)\(\s*prefix="([^"]+)"')
    bad = []
    for path in _py_sources():
        if os.path.relpath(path, REPO).startswith("tests" + os.sep):
            continue  # pytest tmp_path is the test convention
        with open(path) as fh:
            src = fh.read()
        for m in pat.finditer(src):
            prefix = m.group(1)
            if not prefix.startswith("lakehouse-"):
                bad.append(f"{os.path.relpath(path, REPO)}: {prefix!r}")
    assert not bad, (
        "non-namespaced scratch tmp prefixes (janitor sweep hazard): "
        + "; ".join(bad)
    )


def test_survey_labels_match_correctness_union():
    """VERDICT r6+r7 recurring item: SURVEY §8's inline 'driver-green
    rN' labels went stale every round when hand-edited. They are now
    generated from the CORRECTNESS_r*.json union by
    scripts/refresh_survey_labels.py; this gate fails the suite if
    anyone forgets to run it after a new CORRECTNESS artifact lands."""
    r = subprocess.run(
        ["python", os.path.join(REPO, "scripts", "refresh_survey_labels.py"),
         "--check"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stdout[-3000:]


def test_janitor_dry_run_never_fails():
    """The janitor's contract is exit code 0 always; a missing table
    in one sf_dir must not abort the sweep (r8 advice — the
    _source_fingerprint FileNotFoundError class)."""
    r = subprocess.run(
        ["python", os.path.join(REPO, "scripts", "fixture_janitor.py"),
         "--dry-run"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "== kept (live fixture families) ==" in r.stdout
