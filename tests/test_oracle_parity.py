"""Local mirror of the driver's correctness gate (SURVEY.md §5.2).

Every query with an oracle runs in both Spark and DuckDB at sf0.001;
row count, column names, and order-insensitive values must match
exactly. This is intentionally stricter than a tolerance compare —
the driver hashes values, so only bit-stable parity passes.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pytest

from lakehouse_homeserver_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def _norm(v):
    # NB: deliberately NOT converting Decimal -> float. A Decimal in
    # oracle output means the SQL has an unCASTed decimal literal/agg
    # that the driver's value-hash will see as a different value than
    # Spark's double — fail loudly here instead (bit k4_quality_score:
    # a bare `1.0` CASE literal is DECIMAL(2,1) in DuckDB).
    if isinstance(v, Decimal):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return v


def _normalize_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(repr(_norm(row[i])) for i in order))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize_rows(spark_rows, spark_cols)
    d_norm = _normalize_rows(duck_rows, duck_cols)
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_all_queries_run(spark, sf_dir):
    """Queries without oracles must still execute and return rows>=0."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "k6_hash_split", "tpch_q5_local_supplier_volume",
     "k3_centroid_by_label", "ts_rich_sessions",
     # round-2: decimal-summed ranking, prefix-join pairs, banded
     # Hamming pairs, signed-feed IVM — each must be bit-identical
     # under a co-prime partition count
     "k10_bm25", "k2_ppjoin", "k5_ahash_near_dup", "k4_bigram_lm_score",
     "a26_ivm_view", "k1_cdc_chunk_dedup", "d16_histogram_quantiles",
     "d17_theta_sketch_setops", "ts_sliding_hll"],
)
def test_results_invariant_to_partitioning(name, spark, sf_dir):
    """The order-independence contract: decimal-exact sums and
    hash-based ops must produce IDENTICAL values regardless of
    parallelism — re-run with a co-prime shuffle partition count and
    compare full result sets."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    df1 = QUERIES[name](spark, sf_dir)
    r1 = _normalize_rows([tuple(r) for r in df1.collect()], df1.columns)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        df2 = QUERIES[name](spark, sf_dir)
        r2 = _normalize_rows([tuple(r) for r in df2.collect()], df2.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert r1 == r2
