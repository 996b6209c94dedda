"""Mechanical SURVEY §8 label refresh (VERDICT r7 next-round #6).

§8's coverage rows carry inline verdict labels of the form
``driver-green rN (CORRECTNESS_r0N)``. They were hand-edited and went
one round stale in r6 AND r7 (judge item both times). This script
rewrites every label from the CORRECTNESS_r*.json UNION — the same
source of truth the judge recomputes:

  - for each label occurrence, the owning query is resolved on the
    same line: an abbreviated ``(i12 — ...`` parenthetical opener
    right before the label (unique-prefix match), else the nearest
    full registry name BEFORE the label, else the nearest AFTER
    (some rows put the label in the first table cell);
  - the label becomes ``driver-green rU (CORRECTNESS_r0U)`` where U
    is the latest round that sampled the query;
  - unresolvable labels (no registry name on the line) are reported
    and left untouched.

``--check`` exits 1 if any label is stale (used by
tests/test_hygiene.py so the refresh can't be forgotten);
default mode rewrites SURVEY.md in place.

Round-boundary tolerance (VERDICT r8 what's-wrong #1): the driver
drops CORRECTNESS_r{N}.json AFTER the builder's last commit of round
N, so at judge time the labels are inevitably one artifact behind a
file the builder never saw. ``--check`` therefore tolerates a stale
label when the CORRECTNESS artifact that makes it stale was committed
AFTER the last commit touching SURVEY.md (or is still untracked) —
i.e. staleness only fails the suite once the builder has had a chance
to refresh. The refresh itself remains the first action of every
round; default (rewrite) mode ignores the tolerance and always fixes.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LABEL = re.compile(
    r"driver-green r(\d+)(?: re-sample)? \(CORRECTNESS_r0?(\d+)\)"
)


def latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def refresh(text: str, latest: dict[str, int]):
    names = sorted(latest, key=len, reverse=True)
    name_re = re.compile(
        r"\b(" + "|".join(re.escape(n) for n in names) + r")\b"
    )
    out_lines, stale, unresolved = [], [], []
    for lineno, line in enumerate(text.splitlines(keepends=True), 1):
        def sub(m: re.Match) -> str:
            prefix = line[: m.start()]
            owner = None
            # 1. abbreviated parenthetical right before the label:
            #    "... (i12 — registered r6, driver-green ..." — the
            #    token is a unique prefix of exactly one registry name
            pm = re.search(r"\(([a-z][a-z0-9_]*) —[^()]*$", prefix)
            if pm:
                cands = [n for n in names if n.startswith(pm.group(1))]
                if len(cands) == 1:
                    owner = cands[0]
            # 2. nearest full name before; 3. nearest after
            if owner is None:
                before = name_re.findall(prefix)
                if before:
                    owner = before[-1]
                else:
                    after = name_re.findall(line[m.end():])
                    if after:
                        owner = after[0]
            if owner is None:
                unresolved.append((lineno, m.group(0)))
                return m.group(0)
            u = latest[owner]
            new = f"driver-green r{u} (CORRECTNESS_r{u:02d})"
            if new != m.group(0):
                stale.append((lineno, owner, m.group(0), new))
            return new

        out_lines.append(LABEL.sub(sub, line))
    return "".join(out_lines), stale, unresolved


@functools.lru_cache(maxsize=None)
def _last_commit_time(relpath: str):
    """Unix time of the last commit touching relpath; 2**63 if git
    works but the file has no commit yet (untracked = newer than any
    commit); None if git itself is unavailable (not a repo, no
    binary) — the caller must FAIL CLOSED on None, otherwise a
    tarball export or broken git would tolerate every stale label
    (r9 review finding)."""
    try:
        r = subprocess.run(
            ["git", "-C", REPO, "log", "-1", "--format=%ct", "--", relpath],
            capture_output=True, text=True, timeout=30,
        )
    except Exception:
        return None
    if r.returncode != 0:
        return None
    out = r.stdout.strip()
    return int(out) if out else 2**63


def _rounds_by_query() -> dict[str, list[int]]:
    """query -> every round whose CORRECTNESS artifact sampled it."""
    rounds: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for name in json.load(fh):
                rounds.setdefault(name, []).append(rnd)
    return rounds


def _tolerated(stale):
    """Split stale labels into (hard, tolerated) for --check mode: a
    label is tolerated only when EVERY CORRECTNESS artifact newer than
    the label's round (for that query) landed in git strictly after
    SURVEY.md's last commit — i.e. the builder never had a chance to
    refresh. A single such artifact the builder DID see (committed at
    or before SURVEY.md's last commit — the forgotten-refresh case
    this gate exists for) keeps the label hard. Degenerate git info
    (unavailable, or a shallow clone collapsing every file to the tip
    timestamp) fails closed via the strict > and the None guard."""
    survey_t = _last_commit_time("SURVEY.md")
    rounds = _rounds_by_query()
    hard, soft = [], []
    for item in stale:
        _, owner, old, _ = item
        o = int(LABEL.match(old).group(1))
        newer = [r for r in rounds.get(owner, []) if r > o]
        times = [
            _last_commit_time(f"CORRECTNESS_r{r:02d}.json") for r in newer
        ]
        ok = (
            survey_t is not None
            and newer
            and all(t is not None and t > survey_t for t in times)
        )
        (soft if ok else hard).append(item)
    return hard, soft


def main() -> int:
    check = "--check" in sys.argv
    path = os.path.join(REPO, "SURVEY.md")
    with open(path) as fh:
        text = fh.read()
    new_text, stale, unresolved = refresh(text, latest_rounds())
    for lineno, lbl in unresolved:
        print(f"SURVEY.md:{lineno}: unresolvable label left as-is: {lbl}")
    for lineno, owner, old, new in stale:
        print(f"SURVEY.md:{lineno}: {owner}: {old} -> {new}")
    if check:
        hard, soft = _tolerated(stale)
        if soft:
            print(
                f"tolerated {len(soft)} label(s) stale only via a "
                "CORRECTNESS artifact newer than SURVEY.md's last commit "
                "(post-commit driver drop; refresh is round N+1's first "
                "action)"
            )
        if hard:
            print(f"FAIL: {len(hard)} stale §8 labels — run "
                  "scripts/refresh_survey_labels.py")
            return 1
        print("OK: §8 labels match the CORRECTNESS union")
        return 0
    if stale:
        with open(path, "w") as fh:
            fh.write(new_text)
        print(f"rewrote {len(stale)} labels")
    else:
        print("labels already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
