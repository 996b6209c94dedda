"""On-disk format conformance via an INDEPENDENT reader (VERDICT r7
next-round #8, the in-sandbox form): `deltalake`/`pyiceberg` Python
readers aren't installable here, so external readability is proven
the direct way — a from-scratch reader built on pyarrow + json ONLY
(no SnapshotTable code on its read path) reconstructs table state
from the documented layout:

    <table>/_log/<version>.json        commit entries (CAS-published)
    <table>/_log/manifests/<sidecar>   manifest-list indirection
    <table>/data/<file>.parquet        data + delete files

applying the spec rules: per-file sequence numbers (default = entry
version for pre-seq entries), MoR delete files apply iff
delete.seq > data-file seq, equality deletes anti-join their key
columns, positional deletes anti-join (file basename, row ordinal),
schema evolution null-fills missing columns.

If this reader agrees with `SnapshotTable.read()` across a history
mixing appends, both delete kinds, schema evolution, cherry-pick,
compaction and the sidecar path, the format is externally readable —
self-consistency of the engine alone can't fake that.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_homeserver_spark.sources.snapshot import SnapshotTable

_MANIFEST_KEYS = ("manifest", "stats", "seq", "blooms")


# ---------------------------------------------------------------------------
# the independent reader — pyarrow + json only, no engine imports used
# ---------------------------------------------------------------------------

def independent_versions(table: str) -> list[int]:
    log = os.path.join(table, "_log")
    return sorted(
        int(f[:-5])
        for f in os.listdir(log)
        if f.endswith(".json") and not f.startswith(".") and f[:-5].isdigit()
    )


def independent_entry(table: str, version: int) -> dict:
    log = os.path.join(table, "_log")
    with open(os.path.join(log, f"{version:020d}.json")) as fh:
        e = json.load(fh)
    ref = e.get("manifest_ref")
    if ref is not None:
        with open(os.path.join(log, "manifests", ref)) as fh:
            payload = json.load(fh)
        e = {**e, **{k: payload[k] for k in _MANIFEST_KEYS if k in payload}}
    return e


def independent_read(table: str, version: int | None = None) -> pd.DataFrame:
    """Reconstruct the visible rows of one snapshot from disk."""
    versions = independent_versions(table)
    v = versions[-1] if version is None else version
    assert v in versions, f"no snapshot {v}"
    e = independent_entry(table, v)
    cols = [f["name"] for f in json.loads(e["schema"])["fields"]]
    data = os.path.join(table, "data")
    seq = e.get("seq") or {f: e["version"] for f in e["manifest"]}
    dels = e.get("delete_files", [])

    frames = []
    for fname in e["manifest"]:
        pdf = pq.read_table(os.path.join(data, fname)).to_pandas()
        pdf["_pos"] = range(len(pdf))
        fseq = seq.get(fname, 0)
        for d in dels:
            if d["seq"] <= fseq:
                continue  # older than this data file: does not apply
            dkeys = pq.read_table(
                os.path.join(data, d["file"])
            ).to_pandas()
            if d.get("kind") == "positional":
                mine = dkeys[dkeys["_file"] == fname]
                pdf = pdf[~pdf["_pos"].isin(set(mine["_pos"]))]
            else:
                kcols = list(d["columns"])
                if not all(c in pdf.columns for c in kcols):
                    continue  # pre-evolution file lacks the key column
                import numpy as np

                keyset = set(map(tuple, dkeys[kcols].itertuples(index=False)))
                # typed bool array, never a bare list: an EMPTY python
                # list would select zero COLUMNS, not zero rows
                mask = np.fromiter(
                    (
                        tuple(row) not in keyset
                        for row in pdf[kcols].itertuples(index=False)
                    ),
                    dtype=bool,
                    count=len(pdf),
                )
                pdf = pdf[mask]
        pdf = pdf.drop(columns=["_pos"])
        for c in cols:  # schema evolution: null-fill missing columns
            if c not in pdf.columns:
                pdf[c] = None
        frames.append(pdf[cols])
    if not frames:
        return pd.DataFrame(columns=cols)
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------------------------------------
# conformance: independent reader == engine read, across a mixed history
# ---------------------------------------------------------------------------

def _canon(pdf: pd.DataFrame) -> list[tuple]:
    def norm(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if isinstance(v, float):
            return round(v, 2)
        return v

    cols = sorted(pdf.columns)
    rows = [tuple(norm(v) for v in row) for row in pdf[cols].values]
    # None-safe sort: (is_null, value) per element keeps mixed
    # NULL/non-NULL columns comparable
    return sorted(
        rows,
        key=lambda r: tuple(
            (v is None, "" if v is None else v) for v in r
        ),
    )


@pytest.fixture(scope="module")
def nations_module(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


@pytest.fixture(scope="module")
def mixed_history(spark, tmp_path_factory, nations_module):
    """Create / appends / equality-MoR / positional-MoR / schema
    evolution / WAP cherry-pick / compaction, with the sidecar
    threshold forced low so the manifest-list indirection is on the
    read path."""
    root = tmp_path_factory.mktemp("conformance")
    t = SnapshotTable(spark, str(root / "t"), manifest_inline_max=3)
    n = nations_module
    t.create(n.filter("n_nationkey < 8"))
    t.append(n.filter("n_nationkey >= 8 AND n_nationkey < 16"))
    t.delete_where(F.col("n_nationkey") % 5 == 2, mode="mor",
                   equality_on=["n_nationkey"])
    t.append(n.filter("n_nationkey >= 16 AND n_nationkey < 20"))
    t.delete_where(F.col("n_nationkey") % 7 == 3, mode="mor_positional")
    # schema evolution: a tagged append
    t.append(
        n.filter("n_nationkey >= 20").withColumn("batch_tag", F.lit("b5"))
    )
    # WAP: stage on a branch, publish via cherry-pick
    b = t.clone(str(root / "branch"))
    b.append(
        n.filter("n_nationkey < 3").withColumn(
            "n_nationkey", F.col("n_nationkey") + 100
        )
    )
    t.cherry_pick(b, b.latest_version())
    t.compact_files(target_files=2)
    return t


def test_independent_reader_matches_engine_at_every_version(
    spark, mixed_history
):
    t = mixed_history
    for v in t.versions():
        mine = independent_read(t.path, v)
        engine = t.read(version=v).toPandas()
        assert sorted(mine.columns) == sorted(engine.columns), f"v{v}"
        assert _canon(mine) == _canon(engine), (
            f"independent reader diverged from engine at version {v} "
            f"({t.entry(v)['operation']})"
        )


def test_sidecar_indirection_was_actually_exercised(mixed_history):
    t = mixed_history
    raw_with_ref = 0
    for v in t.versions():
        with open(os.path.join(t.path, "_log", f"{v:020d}.json")) as fh:
            if "manifest_ref" in json.load(fh):
                raw_with_ref += 1
    assert raw_with_ref > 0, (
        "fixture never crossed manifest_inline_max — the sidecar path "
        "went untested"
    )


def test_independent_reader_rejects_nothing_engine_accepts(
    spark, mixed_history
):
    """Row counts per entry header must equal what BOTH readers
    materialize at head (the header is part of the format too)."""
    t = mixed_history
    head = t.entry(t.latest_version())
    assert len(independent_read(t.path)) == head["row_count"]
    assert t.read().count() == head["row_count"]
