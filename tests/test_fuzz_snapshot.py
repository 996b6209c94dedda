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
