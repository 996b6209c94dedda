"""Differential fuzz of the Python-DataSource filter-pushdown path
(VERDICT r7 next-round #4): `SnapshotReader.pushFilters` +
`_file_may_match` prune whole data files from footer stats and bloom
filters. The logic is hand-certified by ONE query (`a54`), but its
predicate space is combinatorial — exactly the argument that
justified the r7 query fuzzer. Two layers here:

1. PLANNING layer (~120 seeded predicate sets, no Spark jobs): the
   file set `partitions()` keeps must be a SUPERSET of the files that
   truly contain matching rows (wrongly pruning a live file is the
   only correctness hazard — Spark re-applies every predicate to the
   rows, so over-keeping is merely slack), and `pushFilters` must
   yield back every filter it was handed (the re-apply contract).

2. END-TO-END layer (sampled sets, full Spark plan): the public
   `spark.read.format("snapshot").load(p).filter(...)` result —
   pushdown ON via the session conf — must equal the engine-native
   `SnapshotTable.read().filter(...)` path (which never sees
   pushFilters: the off-comparator) and DuckDB evaluating the same
   predicate over the exported table state.

The fixture mixes multi-file appends, a MoR equality delete and a
positional delete, so partition planning also carries delete files.
"""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_homeserver_spark.sources.snapshot import SnapshotTable

SEED = int(os.environ.get("SPARK_GRAFT_PUSHFUZZ_SEED", "20260815"))
N_SETS = int(os.environ.get("SPARK_GRAFT_PUSHFUZZ_SETS", "120"))
N_E2E = int(os.environ.get("SPARK_GRAFT_PUSHFUZZ_E2E", "12"))

COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


@pytest.fixture(scope="module")
def table(spark, sf_dir, tmp_path_factory):
    """Orders slice as a snapshot table: 5 appends (multi-file
    manifest, overlapping but not identical ranges), bloom on
    o_custkey, one MoR equality delete + one positional delete so the
    planned partitions carry delete files."""
    path = str(tmp_path_factory.mktemp("pushfuzz") / "orders")
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(*COLS)
        .orderBy("o_orderkey")
        .limit(3000)
    )
    t = SnapshotTable(spark, path).with_bloom_filters("o_custkey")
    # slice into 5 key bands -> 5 single-file commits with real,
    # distinct footer stats
    keys = [r[0] for r in orders.select("o_orderkey").collect()]
    keys.sort()
    bands = [keys[i * len(keys) // 5] for i in range(5)] + [keys[-1] + 1]
    t.create(
        orders.filter(
            (F.col("o_orderkey") >= bands[0])
            & (F.col("o_orderkey") < bands[1])
        ).repartition(1)
    )
    for i in range(1, 5):
        t.append(
            orders.filter(
                (F.col("o_orderkey") >= bands[i])
                & (F.col("o_orderkey") < bands[i + 1])
            ).repartition(1)
        )
    t.delete_where(
        F.col("o_custkey") % 7 == 3, mode="mor", equality_on=["o_custkey"]
    )
    t.delete_where(F.col("o_totalprice") < 5000.0, mode="mor_positional")
    return t


def _per_file_frames(t: SnapshotTable) -> dict[str, pd.DataFrame]:
    entry = t.entry(t.latest_version())
    data = os.path.join(t.path, "data")
    return {
        os.path.join(data, f): pq.read_table(
            os.path.join(data, f), columns=COLS
        ).to_pandas()
        for f in entry["manifest"]
    }


def _random_filters(r: random.Random, lo_hi: dict):
    """1-3 conjunctive atoms over the three columns; values are drawn
    around the true ranges with deliberate out-of-range extremes so
    prune-all and prune-none both occur."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

    atoms, exprs = [], []
    for _ in range(r.randrange(1, 4)):
        col = r.choice(COLS)
        lo, hi = lo_hi[col]
        span = hi - lo
        if col == "o_totalprice":
            op = r.choice(["gt", "lt"])  # no float equality
            val = round(lo + span * r.uniform(-0.3, 1.3), 2)
        else:
            op = r.choice(["eq", "gt", "lt"])
            val = int(lo + span * r.uniform(-0.3, 1.3))
        if op == "eq":
            atoms.append(EqualTo((col,), val))
            exprs.append(f"{col} = {val}")
        elif op == "gt":
            atoms.append(GreaterThan((col,), val))
            exprs.append(f"{col} > {val}")
        else:
            atoms.append(LessThan((col,), val))
            exprs.append(f"{col} < {val}")
    return atoms, " AND ".join(exprs)


def _matches(pdf: pd.DataFrame, atoms) -> pd.Series:
    from pyspark.sql.datasource import EqualTo, GreaterThan

    mask = pd.Series(True, index=pdf.index)
    for a in atoms:
        col = a.attribute[0]
        if isinstance(a, EqualTo):
            mask &= pdf[col] == a.value
        elif isinstance(a, GreaterThan):
            mask &= pdf[col] > a.value
        else:
            mask &= pdf[col] < a.value
    return mask


def test_pushdown_never_prunes_a_matching_file(spark, table):
    from lakehouse_homeserver_spark.sources.pyds import SnapshotReader

    t = table
    entry = t.entry(t.latest_version())
    schema = t.read().schema
    frames = _per_file_frames(t)
    lo_hi = {
        c: (
            min(p[c].min() for p in frames.values()),
            max(p[c].max() for p in frames.values()),
        )
        for c in COLS
    }
    r = random.Random(SEED)
    n_pruned_some = 0
    for i in range(N_SETS):
        atoms, expr = _random_filters(r, lo_hi)
        reader = SnapshotReader(schema, entry, t.path)
        yielded = list(reader.pushFilters(list(atoms)))
        assert yielded == list(atoms), (
            f"set {i}: pushFilters must yield back every filter "
            f"(re-apply contract); got {yielded} for {expr}"
        )
        kept = {p.file_path for p in reader.partitions()}
        for fpath, pdf in frames.items():
            if _matches(pdf, atoms).any():
                assert fpath in kept, (
                    f"set {i}: file with matching rows was pruned "
                    f"(expr: {expr}, file: {os.path.basename(fpath)})"
                )
        if len(kept) < len(frames):
            n_pruned_some += 1
    # the generator must actually exercise pruning, not just pass
    # vacuously on keep-everything sets
    assert n_pruned_some >= N_SETS // 4, (
        f"only {n_pruned_some}/{N_SETS} sets pruned anything — "
        "generator drifted; pruning logic effectively untested"
    )


def _fuzz_build(spark, sf_dir, path: str, r: random.Random) -> "SnapshotTable":
    """One RANDOMIZED delete-bearing table build (VERDICT r8 next-round
    #7): banded multi-file appends, then 2-4 delete verbs drawn from
    {MoR equality, MoR positional, CoW rewrite} with random predicates,
    so file pruning is exercised against delete files it did not see at
    hand-certification time (`a36_positional_delete` certifies ONE
    point of this space)."""
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(*COLS)
        .orderBy("o_orderkey")
        .limit(1500)
    )
    t = SnapshotTable(spark, path).with_bloom_filters("o_custkey")
    keys = sorted(
        row[0] for row in orders.select("o_orderkey").collect()
    )
    n_bands = r.randrange(3, 6)
    bands = [keys[i * len(keys) // n_bands] for i in range(n_bands)]
    bands += [keys[-1] + 1]
    slices = [
        orders.filter(
            (F.col("o_orderkey") >= bands[i])
            & (F.col("o_orderkey") < bands[i + 1])
        ).repartition(1)
        for i in range(n_bands)
    ]
    t.create(slices[0])
    rest = slices[1:]
    r.shuffle(rest)
    for s in rest:
        t.append(s)
    lo_k, hi_k = keys[0], keys[-1]
    for _ in range(r.randrange(2, 5)):
        verb = r.choice(["mor_eq", "mor_eq", "mor_pos", "cow"])
        if verb == "mor_eq":
            col = r.choice(["o_custkey", "o_orderkey"])
            m, k = r.randrange(5, 12), r.randrange(0, 5)
            t.delete_where(
                F.col(col) % m == k, mode="mor", equality_on=[col]
            )
        elif verb == "mor_pos":
            cut = r.uniform(2000.0, 200_000.0)
            t.delete_where(
                F.col("o_totalprice") < cut, mode="mor_positional"
            )
        else:
            a = int(lo_k + (hi_k - lo_k) * r.uniform(0.0, 0.8))
            b = a + int((hi_k - lo_k) * r.uniform(0.05, 0.3))
            t.delete_where(
                (F.col("o_orderkey") >= a) & (F.col("o_orderkey") <= b),
                prune_column="o_orderkey",
                lo=a,
                hi=b,
            )
    return t


@pytest.mark.parametrize("build_seed", [0, 1, 2])
def test_pushdown_fuzz_delete_bearing_builds(
    spark, sf_dir, tmp_path, build_seed
):
    """Fuzzed DELETE-BEARING builds through both fuzz layers (VERDICT
    r8 #7). Planning: the kept file set must remain a superset of the
    files whose RAW rows match (stats/bloom pruning knows nothing of
    deletes, so raw-match keep is the safe invariant — over-keep is
    slack, under-keep is the only hazard). End-to-end: pushdown-on
    reads must equal the engine-native read AND DuckDB over the
    INDEPENDENT standalone-reader state — a pruned file's deletes must
    not orphan (rows vanishing from kept files) and a delete file must
    not resurrect a pruned row (rows appearing that the delete
    removed); both show up as set inequality here."""
    import duckdb as _duck

    from lakehouse_homeserver_spark.sources import standalone
    from lakehouse_homeserver_spark.sources.pyds import (
        SnapshotDataSource,
        SnapshotReader,
    )

    r = random.Random(SEED + 100 + build_seed)
    t = _fuzz_build(spark, sf_dir, str(tmp_path / "fuzztab"), r)

    # -- planning layer ------------------------------------------------
    entry = t.entry(t.latest_version())
    schema = t.read().schema
    frames = _per_file_frames(t)
    lo_hi = {
        c: (
            min(p[c].min() for p in frames.values()),
            max(p[c].max() for p in frames.values()),
        )
        for c in COLS
    }
    n_pruned_some = 0
    n_sets = max(N_SETS // 4, 20)
    for i in range(n_sets):
        atoms, expr = _random_filters(r, lo_hi)
        reader = SnapshotReader(schema, entry, t.path)
        assert list(reader.pushFilters(list(atoms))) == list(atoms)
        kept = {p.file_path for p in reader.partitions()}
        for fpath, pdf in frames.items():
            if _matches(pdf, atoms).any():
                assert fpath in kept, (
                    f"build {build_seed} set {i}: file with matching "
                    f"raw rows pruned (expr: {expr}, "
                    f"file: {os.path.basename(fpath)})"
                )
        if len(kept) < len(frames):
            n_pruned_some += 1
    assert n_pruned_some >= n_sets // 5, (
        f"build {build_seed}: only {n_pruned_some}/{n_sets} sets pruned "
        "anything — delete-bearing generator drifted"
    )

    # -- end-to-end layer ----------------------------------------------
    spark.dataSource.register(SnapshotDataSource)
    state = standalone.read_pandas(t.path)[COLS]
    duck = _duck.connect()
    duck.register("state", state)
    pds = spark.read.format("snapshot").load(t.path)
    native = t.read()
    # whole-state agreement first: catches orphaned/resurrected rows
    # with no predicate in the way
    whole = sorted(map(tuple, pds.select(*COLS).collect()))
    assert whole == sorted(map(tuple, native.select(*COLS).collect()))
    assert whole == sorted(map(tuple, state.itertuples(index=False)))
    for i in range(max(N_E2E // 3, 4)):
        atoms, expr = _random_filters(r, lo_hi)
        got = sorted(map(tuple, pds.filter(expr).select(*COLS).collect()))
        off = sorted(
            map(tuple, native.filter(expr).select(*COLS).collect())
        )
        oracle = sorted(
            map(
                tuple,
                duck.execute(
                    f"SELECT {', '.join(COLS)} FROM state WHERE {expr}"
                ).fetchall(),
            )
        )
        assert got == off, (
            f"build {build_seed} set {i}: pushdown-on vs native ({expr})"
        )
        assert got == oracle, (
            f"build {build_seed} set {i}: vs DuckDB/standalone ({expr})"
        )


def test_pushdown_end_to_end_agrees_with_native_and_duckdb(spark, table):
    from lakehouse_homeserver_spark.sources.pyds import SnapshotDataSource

    t = table
    spark.dataSource.register(SnapshotDataSource)
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    ), "session must plan the pushFilters path"
    state = t.read().toPandas()  # engine-native full state, once
    duck = duckdb.connect()
    duck.register("state", state)
    lo_hi = {c: (state[c].min(), state[c].max()) for c in COLS}
    r = random.Random(SEED + 1)
    pds = spark.read.format("snapshot").load(t.path)
    native = t.read()
    for i in range(N_E2E):
        atoms, expr = _random_filters(r, lo_hi)
        got = sorted(
            map(tuple, pds.filter(expr).select(*COLS).collect())
        )
        off = sorted(
            map(tuple, native.filter(expr).select(*COLS).collect())
        )
        oracle = sorted(
            map(
                tuple,
                duck.execute(
                    f"SELECT {', '.join(COLS)} FROM state WHERE {expr}"
                ).fetchall(),
            )
        )
        assert got == off, f"set {i}: pushdown-on vs native diverged ({expr})"
        assert got == oracle, f"set {i}: vs DuckDB diverged ({expr})"
