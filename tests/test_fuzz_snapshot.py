"""Differential fuzz of the ACID snapshot layer against a pandas
model (the r7 companion to tests/test_fuzz_duckdb.py — that one walks
the QUERY surface, this one walks the MUTATION surface).

Every commit verb (`append`, both CoW and both MoR delete strategies,
MERGE upsert, rollback, create_or_replace, compaction, expiry) is
exercised in seeded random SEQUENCES, and after every commit the
table must read back exactly equal to an independently-maintained
in-memory model. Random composition is the point: the handwritten
suites certify each verb in isolation and in a few curated chains,
but defects like "MoR delete file applied to a file appended later"
or "rollback over a pending delete resurrects rows" live in verb
INTERLEAVINGS nobody wrote down. Time travel is spot-checked against
the model's recorded per-version states, and expiry must invalidate
exactly the versions it reports expired while the carried head stays
byte-equal.

Reference parity: the reference's Iceberg tables expose exactly this
verb set to every engine (SURVEY.md §2.A5-A12); sequence-level
correctness is the table-format contract users actually rely on.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lakehouse_homeserver_spark.sources.snapshot import (
    SnapshotNotFound,
    SnapshotTable,
)

N_OPS = int(os.environ.get("SPARK_GRAFT_SNAPFUZZ_OPS", "28"))
SEED = int(os.environ.get("SPARK_GRAFT_SNAPFUZZ_SEED", "20260815"))

SCHEMA = "k long, grp string, val double"
GROUPS = ["alpha", "beta", "gamma", "delta"]


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    rows = [
        (int(k), str(g), round(float(v), 2))
        for k, g, v in zip(pdf["k"], pdf["grp"], pdf["val"])
    ]
    return sorted(rows)


class Model:
    """The in-memory truth: a list of (k, grp, val) tuples plus the
    recorded state at every live version."""

    def __init__(self):
        self.rows: list[tuple] = []
        self.at_version: dict[int, list[tuple]] = {}

    def record(self, version: int):
        self.at_version[version] = list(self.rows)


def _mk_rows(r: random.Random, n: int, key_base: int) -> list[tuple]:
    return [
        (
            key_base + i,
            r.choice(GROUPS),
            round(r.uniform(0, 1000), 2),
        )
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_mutation_sequence_fuzz(spark, tmp_path):
    r = random.Random(SEED)
    t = SnapshotTable(spark, str(tmp_path / "fuzz"))
    m = Model()
    key_base = 0

    rows = _mk_rows(r, 30, key_base)
    key_base += 1000
    res = t.create(_df(spark, rows))
    m.rows = list(rows)
    m.record(res["version"])

    applied = ["create"]
    for step in range(N_OPS):
        op = r.choices(
            [
                "append",
                "delete_cow",
                "delete_mor_eq",
                "delete_mor_pos",
                "merge",
                "rollback",
                "replace",
                "compact",
                "expire",
            ],
            weights=[22, 12, 12, 12, 14, 8, 5, 8, 7],
        )[0]
        applied.append(op)
        if op == "append":
            rows = _mk_rows(r, r.randrange(5, 25), key_base)
            key_base += 1000
            res = t.append(_df(spark, rows))
            m.rows.extend(rows)
        elif op in ("delete_cow", "delete_mor_eq", "delete_mor_pos"):
            mod, rem = r.randrange(3, 9), r.randrange(0, 3)
            pred = (F.col("k") % mod) == rem
            kwargs = {}
            if op == "delete_cow":
                kwargs["mode"] = "cow"
            elif op == "delete_mor_eq":
                kwargs["mode"] = "mor"
                kwargs["equality_on"] = ["k"]
            else:
                kwargs["mode"] = "mor_positional"
            res = t.delete_where(pred, **kwargs)
            m.rows = [row for row in m.rows if row[0] % mod != rem]
        elif op == "merge":
            # source: updates for a sample of existing keys + fresh
            # inserts, unique keys within the source by construction
            existing = sorted({row[0] for row in m.rows})
            upd_keys = r.sample(existing, min(len(existing), r.randrange(1, 8)))
            src = [
                (k, r.choice(GROUPS), round(r.uniform(0, 1000), 2))
                for k in upd_keys
            ] + _mk_rows(r, r.randrange(1, 6), key_base)
            key_base += 1000
            res = t.merge(_df(spark, src), on=["k"])
            src_keys = {row[0] for row in src}
            m.rows = [row for row in m.rows if row[0] not in src_keys] + src
        elif op == "rollback":
            live = [v for v in t.versions() if v in m.at_version]
            if len(live) < 2:
                applied[-1] = "rollback(skipped)"
                continue
            target = r.choice(live[:-1])
            res = t.rollback(target)
            m.rows = list(m.at_version[target])
        elif op == "replace":
            rows = _mk_rows(r, r.randrange(10, 30), key_base)
            key_base += 1000
            res = t.create_or_replace(_df(spark, rows))
            m.rows = list(rows)
        elif op == "compact":
            res = t.compact_files(target_files=2)
        elif op == "expire":
            keep = r.randrange(2, 5)
            before = set(t.versions())
            t.expire_snapshots(keep_last=keep, orphan_grace_ms=0)
            retained = set(t.versions())
            gone = before - retained
            # expired versions must be unreadable; retained recorded
            # states must still read exactly
            for v in gone:
                m.at_version.pop(v, None)
                with pytest.raises(SnapshotNotFound):
                    t.entry(v)
            res = {"version": t.latest_version()}
        if op != "expire":
            m.record(res["version"])

        got = _canon(t.read().toPandas())
        want = sorted(
            (int(k), str(g), round(float(v), 2)) for k, g, v in m.rows
        )
        assert got == want, (
            f"step {step} op {op}: table diverged from model "
            f"(seq: {applied})\n table={got[:5]}...\n model={want[:5]}..."
        )
        # time-travel spot check every few steps: one random recorded
        # LIVE version must read back as its recorded state
        if step % 4 == 3:
            live = [v for v in t.versions() if v in m.at_version]
            v = r.choice(live)
            tt = _canon(t.read(version=v).toPandas())
            exp = sorted(
                (int(k), str(g), round(float(v2), 2))
                for k, g, v2 in m.at_version[v]
            )
            assert tt == exp, (
                f"step {step}: time travel to v{v} diverged (seq: {applied})"
            )


# ---------------------------------------------------------------------------
# Extended fuzz (VERDICT r7 next-round #3): WAP branch/cherry-pick
# verbs, additive schema evolution MID-SEQUENCE, and two-handle
# interleavings — the surfaces the r7 sequences never reached. The
# a22 branch-point bug and the r6 GC race were both SEQUENCE defects
# on exactly these verbs.
# ---------------------------------------------------------------------------

N_OPS_EXT = int(os.environ.get("SPARK_GRAFT_SNAPFUZZ_EXT_OPS", "26"))

EVOLVED_COLS = [("tag", "string"), ("w", "double")]


def _canon_rows(rows: list[dict], cols: list[str]) -> list[tuple]:
    def norm(c, v):
        if v is None or (isinstance(v, float) and v != v):  # NaN
            return None
        if c in ("val", "w"):
            return round(float(v), 2)
        if c == "k":
            return int(v)
        return str(v)

    return sorted(tuple(norm(c, row.get(c)) for c in cols) for row in rows)


def _canon_pdf(pdf: pd.DataFrame, cols: list[str]) -> list[tuple]:
    assert sorted(pdf.columns) == sorted(cols), (
        f"schema diverged: table={sorted(pdf.columns)} model={sorted(cols)}"
    )
    return _canon_rows(pdf.to_dict("records"), cols)


class EvolvingModel:
    """Truth with schema tracking: rows are dicts; at_version records
    (rows, cols) so time travel and rollback check the SCHEMA each
    version carried, not just the values."""

    def __init__(self):
        self.rows: list[dict] = []
        self.cols: list[str] = ["k", "grp", "val"]
        self.at_version: dict[int, tuple[list[dict], list[str]]] = {}

    def record(self, version: int):
        self.at_version[version] = ([dict(x) for x in self.rows], list(self.cols))


def _mk_dict_rows(r: random.Random, n: int, key_base: int, cols) -> list[dict]:
    out = []
    for i in range(n):
        row = {
            "k": key_base + i,
            "grp": r.choice(GROUPS),
            "val": round(r.uniform(0, 1000), 2),
        }
        for c in cols:
            if c == "tag":
                row["tag"] = r.choice(["a", "b", "c"])
            elif c == "w":
                row["w"] = round(r.uniform(0, 10), 2)
        out.append(row)
    return out


def _dict_df(spark, rows: list[dict], cols: list[str]):
    types = {"k": "long", "grp": "string", "val": "double",
             "tag": "string", "w": "double"}
    schema = ", ".join(f"{c} {types[c]}" for c in cols)
    return spark.createDataFrame(
        [tuple(row.get(c) for c in cols) for row in rows], schema
    )


def test_mutation_sequence_fuzz_extended(spark, tmp_path):
    r = random.Random(SEED + 1)
    path = str(tmp_path / "fuzz-ext")
    # two handles on the SAME table: every op picks one at random, so
    # each commit may land on state the committing handle never wrote
    # (handles re-resolve the head per attempt — the contract)
    handles = [SnapshotTable(spark, path), SnapshotTable(spark, path)]
    m = EvolvingModel()
    key_base = 0
    n_branch = 0

    rows = _mk_dict_rows(r, 20, key_base, m.cols)
    key_base += 1000
    res = handles[0].create(_dict_df(spark, rows, m.cols))
    m.rows = [dict(x) for x in rows]
    m.record(res["version"])

    applied = ["create"]
    pending_evolutions = [c for c, _ in EVOLVED_COLS]
    tagged: dict[str, int] = {}  # tag name -> version it pins
    for step in range(N_OPS_EXT):
        t = r.choice(handles)
        op = r.choices(
            [
                "append",
                "delete_mor_eq",
                "merge",
                "merge_delete",
                "rollback",
                "compact",
                "expire",
                "wap_publish",
                "wap_discard",
                "evolve",
                "tag",
            ],
            weights=[14, 9, 8, 6, 6, 6, 6, 14, 7,
                     10 if pending_evolutions else 0, 7],
        )[0]
        applied.append(op)
        if op == "append":
            rows = _mk_dict_rows(r, r.randrange(4, 15), key_base, m.cols)
            key_base += 1000
            res = t.append(_dict_df(spark, rows, m.cols))
            m.rows.extend(dict(x) for x in rows)
        elif op == "delete_mor_eq":
            mod, rem = r.randrange(3, 9), r.randrange(0, 3)
            res = t.delete_where(
                (F.col("k") % mod) == rem, mode="mor", equality_on=["k"]
            )
            m.rows = [x for x in m.rows if x["k"] % mod != rem]
        elif op == "merge":
            existing = sorted({x["k"] for x in m.rows})
            upd = r.sample(existing, min(len(existing), r.randrange(1, 6)))
            src = [
                {**_mk_dict_rows(r, 1, k, m.cols)[0], "k": k} for k in upd
            ] + _mk_dict_rows(r, r.randrange(1, 5), key_base, m.cols)
            key_base += 1000
            res = t.merge(_dict_df(spark, src, m.cols), on=["k"])
            src_keys = {x["k"] for x in src}
            m.rows = [x for x in m.rows if x["k"] not in src_keys] + [
                dict(x) for x in src
            ]
        elif op == "merge_delete":
            # MERGE with the delete-matched branch: source keys are a
            # sample of existing rows (dropped) + fresh keys whose
            # fate depends on when_not_matched
            existing = sorted({x["k"] for x in m.rows})
            if not existing:
                applied[-1] = "merge_delete(skipped)"
                continue
            hit = r.sample(existing, min(len(existing), r.randrange(1, 5)))
            fresh = _mk_dict_rows(r, r.randrange(0, 3), key_base, m.cols)
            key_base += 1000
            src = [
                {**_mk_dict_rows(r, 1, k, m.cols)[0], "k": k} for k in hit
            ] + fresh
            wnm = r.choice(["insert", "ignore"])
            res = t.merge(
                _dict_df(spark, src, m.cols),
                on=["k"],
                when_matched="delete",
                when_not_matched=wnm,
            )
            hitset = set(hit)
            m.rows = [x for x in m.rows if x["k"] not in hitset]
            if wnm == "insert":
                m.rows.extend(dict(x) for x in fresh)
        elif op == "rollback":
            live = [v for v in t.versions() if v in m.at_version]
            if len(live) < 2:
                applied[-1] = "rollback(skipped)"
                continue
            target = r.choice(live[:-1])
            res = t.rollback(target)
            rows_v, cols_v = m.at_version[target]
            m.rows = [dict(x) for x in rows_v]
            m.cols = list(cols_v)
        elif op == "compact":
            res = t.compact_files(target_files=2)
        elif op == "tag":
            live = [v for v in t.versions() if v in m.at_version]
            name = f"rel-{step}"
            v = r.choice(live)
            t.tag(name, v)
            tagged[name] = v
            applied[-1] = f"tag(v{v})"
            res = {"version": t.latest_version()}
            # resolve-by-name must read the pinned state right away
            rows_v, cols_v = m.at_version[v]
            got = _canon_pdf(t.read(version=name).toPandas(), cols_v)
            assert got == _canon_rows(rows_v, cols_v)
            continue  # no commit: nothing new to record or re-check
        elif op == "expire":
            before = set(t.versions())
            t.expire_snapshots(keep_last=r.randrange(2, 5), orphan_grace_ms=0)
            gone = before - set(t.versions())
            # tagged snapshots are LIVE to GC: the pin must survive
            assert not (gone & set(tagged.values())), (
                f"step {step}: expire removed a tagged version "
                f"(tags={tagged}, gone={gone})"
            )
            for name, v in tagged.items():
                rows_v, cols_v = m.at_version[v]
                got = _canon_pdf(t.read(version=name).toPandas(), cols_v)
                assert got == _canon_rows(rows_v, cols_v), (
                    f"step {step}: tag {name} diverged after expire"
                )
            for v in gone:
                m.at_version.pop(v, None)
                with pytest.raises(SnapshotNotFound):
                    t.entry(v)
            res = {"version": t.latest_version()}
        elif op in ("wap_publish", "wap_discard"):
            import shutil

            n_branch += 1
            b = t.clone(str(tmp_path / f"branch-{n_branch}"))
            branch_v = b.latest_version()  # branch point, branch space
            staged_rows = _mk_dict_rows(
                r, r.randrange(3, 10), key_base, m.cols
            )
            key_base += 1000
            b.append(_dict_df(spark, staged_rows, m.cols))
            # audit in the branch's version space (the a22 bug class:
            # this must see EXACTLY the staged batch however many
            # commits main carries)
            staged = b.added_between(branch_v)
            assert staged.count() == len(staged_rows), (
                f"step {step}: WAP audit scope wrong (seq: {applied})"
            )
            # main unaffected while the audit runs
            assert _canon_pdf(t.read().toPandas(), m.cols) == _canon_rows(
                m.rows, m.cols
            )
            if op == "wap_publish":
                res = t.cherry_pick(b, b.latest_version())
                m.rows.extend(dict(x) for x in staged_rows)
            else:
                shutil.rmtree(b.path)
                res = {"version": t.latest_version()}
                applied[-1] = "wap_discard"
                # nothing committed on main: no new version to record
                got = _canon_pdf(t.read().toPandas(), m.cols)
                assert got == _canon_rows(m.rows, m.cols)
                continue
        elif op == "evolve":
            col = pending_evolutions.pop(0)
            new_cols = m.cols + [col]
            rows = _mk_dict_rows(r, r.randrange(3, 8), key_base, new_cols)
            key_base += 1000
            res = t.append(_dict_df(spark, rows, new_cols))
            m.cols = new_cols
            m.rows.extend(dict(x) for x in rows)
        if op != "expire":
            m.record(res["version"])

        got = _canon_pdf(t.read().toPandas(), m.cols)
        want = _canon_rows(m.rows, m.cols)
        assert got == want, (
            f"step {step} op {op}: diverged (seq: {applied})\n"
            f" table={got[:4]}...\n model={want[:4]}..."
        )
        # cross-handle visibility: the OTHER handle must read the same
        other = handles[1] if t is handles[0] else handles[0]
        assert _canon_pdf(other.read().toPandas(), m.cols) == want
        if step % 4 == 3:
            live = [v for v in t.versions() if v in m.at_version]
            v = r.choice(live)
            rows_v, cols_v = m.at_version[v]
            tt = _canon_pdf(t.read(version=v).toPandas(), cols_v)
            assert tt == _canon_rows(rows_v, cols_v), (
                f"step {step}: time travel to v{v} diverged (seq: {applied})"
            )


def test_concurrent_mixed_verbs_log_is_truth(spark, tmp_path):
    """Threaded mixed-verb interleaving (append vs MoR delete vs
    merge, two writers with retry-on-conflict like real clients).
    The final interleaving is nondeterministic, so the invariants are
    the CONTRACT, not a fixed outcome:

      1. versions are contiguous 1..N and every entry parses;
      2. no lost appends — every batch a writer successfully
         committed appears in exactly one entry's `added` list;
      3. the log is the truth — the INDEPENDENT pyarrow reader
         (test_format_conformance) reconstructs every version from
         disk and matches the engine read, so whatever interleaving
         happened, each published snapshot is internally consistent;
      4. conflict-aborted deletes leave nothing behind (their staged
         delete files are removed on CommitConflict).
    """
    from concurrent.futures import ThreadPoolExecutor

    from test_format_conformance import _canon as conf_canon
    from test_format_conformance import independent_read

    from lakehouse_homeserver_spark.sources.snapshot import CommitConflict

    path = str(tmp_path / "mixed")
    t0 = SnapshotTable(spark, path)
    t0.create(spark.createDataFrame(
        [(i, "seed", 1.0) for i in range(20)], SCHEMA
    ))
    committed_batches: dict[str, list[int]] = {}
    conflicts = {"n": 0}

    def appender(wid: int):
        t = SnapshotTable(spark, path)
        for i in range(5):
            keys = [10_000 * wid + 100 * i + j for j in range(4)]
            t.append(spark.createDataFrame(
                [(k, f"w{wid}", 2.0) for k in keys], SCHEMA
            ))
            committed_batches[f"w{wid}b{i}"] = keys

    def deleter():
        t = SnapshotTable(spark, path)
        for mod in (7, 11, 13):
            for _ in range(6):  # bounded retry loop, real-client style
                try:
                    t.delete_where(
                        (F.col("k") % mod) == 1, mode="mor",
                        equality_on=["k"],
                    )
                    break
                except CommitConflict:
                    conflicts["n"] += 1
            else:  # pragma: no cover
                pytest.fail(f"delete mod {mod} never committed")

    with ThreadPoolExecutor(max_workers=3) as ex:
        futs = [ex.submit(appender, 1), ex.submit(appender, 2),
                ex.submit(deleter)]
        for f in futs:
            f.result()

    # 1. contiguous versions, all entries parse
    vs = t0.versions()
    assert vs == list(range(1, len(vs) + 1))
    assert len(vs) == 1 + 10 + 3  # create + 10 appends + 3 deletes

    # 2. no lost appends: every committed batch's keys in exactly one
    # entry's added files
    added_keys: list[int] = []
    for v in vs:
        e = t0.entry(v)
        if e["operation"] not in ("create", "append"):
            continue
        for f in e["added"]:
            import pyarrow.parquet as pq

            added_keys.extend(
                pq.read_table(
                    os.path.join(path, "data", f), columns=["k"]
                )["k"].to_pylist()
            )
    for name, keys in committed_batches.items():
        for k in keys:
            assert added_keys.count(k) == 1, (name, k)

    # 3. every version reconstructs identically from disk alone
    for v in vs:
        assert conf_canon(independent_read(path, v)) == conf_canon(
            t0.read(version=v).toPandas()
        ), f"version {v} not reconstructable"

    # 4. final state honors all three deletes modulo later appends:
    # any surviving k%mod==1 row must come from an append SEQUENCED
    # AFTER that delete's commit (Iceberg's seq rule) — verified by
    # the independent reader agreeing above; sanity: the seed rows
    # (k<20, all seq 1) hit by any delete are gone
    final = {r.k for r in t0.read().collect()}
    for mod in (7, 11, 13):
        for k in range(20):
            if k % mod == 1:
                assert k not in final, (mod, k)


def test_concurrent_appends_all_land(spark, tmp_path):
    """Optimistic CAS under real thread contention: two writers
    appending disjoint batches concurrently must BOTH land (retry on
    lost race), never clobber — the multi-writer contract Iceberg
    implements with conditional catalog swaps."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "cc")
    t0 = SnapshotTable(spark, path)
    t0.create(spark.createDataFrame([(0, "seed", 0.0)], SCHEMA))

    def writer(wid: int):
        t = SnapshotTable(spark, path)
        for i in range(4):
            rows = [(1000 * wid + 10 * i + j, f"w{wid}", 1.0) for j in range(3)]
            t.append(spark.createDataFrame(rows, SCHEMA))

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(writer, [1, 2]))

    got = sorted(row.k for row in t0.read().collect())
    want = sorted(
        [0]
        + [1000 * w + 10 * i + j for w in (1, 2) for i in range(4) for j in range(3)]
    )
    assert got == want
    # 1 create + 8 appends, every one a distinct contiguous version
    assert t0.versions() == list(range(1, 10))


_XPROC_WORKER = r'''
"""Spark-FREE commit worker: stages a parquet data file with pyarrow,
then publishes it through the engine's own low-level protocol —
latest_version -> entry merge -> _write_entry (tmp + os.link O_EXCL
CAS) — retrying lost races. Exercises the exact code the engine's
_commit loop runs, under REAL process isolation (no shared GIL, no
shared dict caches). argv: repo table_path wid n_commits go_file."""
import json
import os
import sys
import time

repo, path, wid, n, go = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
)
sys.path.insert(0, repo)
import pyarrow as pa
import pyarrow.parquet as pq

from lakehouse_homeserver_spark.sources.snapshot import (
    SnapshotTable, _file_seq, _footer_stats,
)

t = SnapshotTable(None, path)
while not os.path.exists(go):  # start barrier
    time.sleep(0.005)
race_dir = os.path.join(path, "_race")
os.makedirs(race_dir, exist_ok=True)


def rendezvous(head_v):
    """Deterministic contention: publish a marker for the head this
    worker is about to CAS against, then wait (bounded) until some
    OTHER worker has marked the same head — so two processes attempt
    the same os.link target and exactly one must lose. Markers
    persist, so a worker that already moved past this head satisfies
    the wait immediately (no deadlock); the timeout is a backstop for
    a worker running alone at the tail."""
    me = os.path.join(race_dir, f"{head_v}-{wid}")
    open(me, "w").close()
    deadline = time.time() + 3.0
    while time.time() < deadline:
        others = [
            f for f in os.listdir(race_dir)
            if f.startswith(f"{head_v}-") and f != f"{head_v}-{wid}"
        ]
        if others:
            return
        time.sleep(0.002)


retries = 0
for i in range(n):
    fname = f"xproc-w{wid}-{i}.parquet"
    fpath = os.path.join(path, "data", fname)
    pq.write_table(
        pa.table({
            "k": pa.array([1000 * wid + i], pa.int64()),
            "grp": [f"w{wid}"],
            "val": pa.array([float(i)], pa.float64()),
        }),
        fpath,
    )
    rows, stats = _footer_stats(fpath)
    for attempt in range(500):
        head_v = t.latest_version()
        head = t.entry(head_v)
        new_v = head_v + 1
        if i < 4 and attempt == 0:
            rendezvous(head_v)
        entry = {
            "version": new_v,
            "parent": head_v,
            "timestamp_ms": int(time.time() * 1000),
            "operation": "append",
            "manifest": head["manifest"] + [fname],
            "added": [fname],
            "schema": head["schema"],
            "row_count": head["row_count"] + rows,
            "stats": {**head.get("stats", {}), fname: stats},
            "blooms": head.get("blooms", {}),
            "seq": {**_file_seq(head), fname: new_v},
            "delete_files": list(head.get("delete_files", [])),
            "properties": dict(head.get("properties", {})),
        }
        if t._write_entry(entry):
            break
        retries += 1
    else:
        sys.exit(3)
print(json.dumps({"wid": wid, "retries": retries}))
'''


def test_cross_process_two_writer_cas(spark, tmp_path):
    """The O_EXCL commit CAS under REAL process isolation (VERDICT r8
    next-round #8): the threaded variant shares one interpreter, so
    tmp-link races there are serialized by the GIL more than a
    multi-process writer fleet would be. Three Spark-free processes
    publish 12 appends each against the same _log through the engine's
    own _write_entry; the log must come out contiguous with
    parent == version-1 everywhere, every staged file exactly once in
    the final manifest, and the Spark read, the standalone reader and
    the per-entry row_count ledger must all agree."""
    import json as _json
    import subprocess
    import sys as _sys

    from lakehouse_homeserver_spark.sources import standalone

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "xproc")
    t0 = SnapshotTable(spark, path)
    t0.create(spark.createDataFrame([(0, "seed", 0.0)], SCHEMA))

    worker = tmp_path / "xproc_worker.py"
    worker.write_text(_XPROC_WORKER)
    go = str(tmp_path / "go")
    n_workers, n_commits = 3, 12
    procs = [
        subprocess.Popen(
            [_sys.executable, str(worker), repo, path, str(w), str(n_commits), go],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(1, n_workers + 1)
    ]
    open(go, "w").close()  # release the barrier
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed rc={p.returncode}: {err[-2000:]}"

    total = n_workers * n_commits
    # contiguous log, every parent the previous version
    assert t0.versions() == list(range(1, total + 2))
    for v in t0.versions():
        e = t0.entry(v)
        assert e["parent"] == (v - 1 if v > 1 else None), (v, e["parent"])
    # every staged file exactly once; ledger counts rows
    final = t0.entry(t0.latest_version())
    want_files = {
        f"xproc-w{w}-{i}.parquet"
        for w in range(1, n_workers + 1)
        for i in range(n_commits)
    }
    assert set(final["manifest"]) >= want_files
    assert len(final["manifest"]) == len(set(final["manifest"]))
    assert final["row_count"] == total + 1
    # engine read == standalone read == expected keys
    got = sorted(r.k for r in t0.read().collect())
    want = sorted([0] + [1000 * w + i for w in range(1, n_workers + 1) for i in range(n_commits)])
    assert got == want
    assert sorted(standalone.read_pandas(path)["k"]) == want
    # the race must have actually happened for this to certify anything
    retries = sum(_json.loads(out.strip().splitlines()[-1])["retries"] for out, _ in outs)
    assert retries >= 1, "no lost CAS race observed — barrier/commit pacing drifted"
