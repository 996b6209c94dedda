"""SQL-text DML front-end tests (SURVEY A-ext, VERDICT r11 #2).

The contract under test: the three statement shapes the reference's
stack exposes (`MERGE INTO` / `UPDATE ... SET` / `DELETE FROM`) parse
from TEXT and route to the already-certified SnapshotTable ops with
bit-identical results to the API twins — and every shape outside that
grammar fails LOUDLY (a silently-misparsed DML statement corrupts
tables).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from lakehouse_homeserver_spark.operators.dml import DmlSession
from lakehouse_homeserver_spark.sources.snapshot import SnapshotTable


def _rows(df, *cols):
    key = cols or df.columns
    return sorted(tuple(r[c] for c in key) for r in df.collect())


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(
        [
            Row(k=1, v=10.0, tag="a"),
            Row(k=2, v=-5.0, tag="b"),
            Row(k=3, v=None, tag="c"),
            Row(k=4, v=7.0, tag="d"),
        ]
    )


@pytest.fixture()
def sess(spark, tmp_path, base_df):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(base_df)
    s = DmlSession(spark)
    s.bind_table("t", t)
    return s, t


def test_merge_sql_equals_api_twin(spark, tmp_path, base_df):
    """MERGE text route == SnapshotTable.merge with the same plan."""
    src = spark.createDataFrame(
        [Row(k=2, v=99.0, tag="upd"), Row(k=9, v=1.0, tag="ins")]
    )
    t_sql = SnapshotTable(spark, str(tmp_path / "sql"))
    t_api = SnapshotTable(spark, str(tmp_path / "api"))
    t_sql.create(base_df)
    t_api.create(base_df)

    s = DmlSession(spark)
    s.bind_table("t", t_sql)
    s.bind_source("src", src)
    entry = s.sql(
        "MERGE INTO t USING src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *;"
    )
    t_api.merge(src, on=["k"])
    assert entry["operation"] == "merge"
    assert _rows(t_sql.read()) == _rows(t_api.read())


def test_merge_when_matched_delete(spark, tmp_path, base_df, sess):
    s, t = sess
    src = spark.createDataFrame([Row(k=1, v=0.0, tag="x")])
    s.bind_source("dsrc", src)
    s.sql("MERGE INTO t USING dsrc ON t.k = dsrc.k "
          "WHEN MATCHED THEN DELETE")
    assert _rows(t.read(), "k") == [(2,), (3,), (4,)]


def test_merge_using_subquery(spark, sess):
    s, t = sess
    s.bind_source(
        "pool",
        spark.createDataFrame(
            [Row(k=4, v=40.0, tag="u"), Row(k=5, v=50.0, tag="i"),
             Row(k=6, v=-1.0, tag="skip")]
        ),
    )
    s.sql(
        "MERGE INTO t USING (SELECT * FROM pool WHERE v > 0.0) AS s "
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    out = dict((r["k"], (r["v"], r["tag"])) for r in t.read().collect())
    assert out[4] == (40.0, "u") and out[5] == (50.0, "i")
    assert 6 not in out


def test_update_simultaneous_assignment_and_cast(spark, tmp_path):
    """SET a = b, b = a swaps (RHS reads the OLD row); RHS is cast to
    the column's existing type (SQL assignment coercion)."""
    t = SnapshotTable(spark, str(tmp_path / "swap"))
    t.create(spark.createDataFrame([Row(a=1.0, b=2.0), Row(a=3.0, b=4.0)]))
    s = DmlSession(spark)
    s.bind_table("t", t)
    s.sql("UPDATE t SET a = b, b = a")
    assert _rows(t.read()) == [(2.0, 1.0), (4.0, 3.0)]
    # int-literal RHS lands as the column's double type, not a schema
    # evolution conflict
    s.sql("UPDATE t SET a = 7 WHERE b = 1.0")
    assert dict(_rows(t.read(), "b", "a"))[1.0] == 7.0
    assert t.schema()["a"].dataType.simpleString() == "double"


def test_update_where_region_and_null_pred_rows_survive(sess):
    s, t = sess
    # k=3 has v NULL -> predicate NULL -> row survives untouched;
    # k=2's update moves it OUT of the region (v becomes positive),
    # which plain replaceWhere validation would reject — UPDATE allows.
    s.sql("UPDATE t SET v = v + 100.0, tag = upper(tag) WHERE v < 0.0")
    assert _rows(t.read()) == [
        (1, 10.0, "a"), (2, 95.0, "B"), (3, None, "c"), (4, 7.0, "d"),
    ]


def test_update_rhs_with_commas_and_keywords_in_literals(sess):
    s, t = sess
    # top-level comma split must not break inside coalesce(...); the
    # string literal contains WHERE/SET/; which must not confuse the
    # clause scanner
    s.sql("UPDATE t SET v = coalesce(v, -1.0), "
          "tag = 'WHERE; SET x = 1' WHERE k = 3")
    got = dict((r["k"], (r["v"], r["tag"])) for r in t.read().collect())
    assert got[3] == (-1.0, "WHERE; SET x = 1")


def test_delete_where_and_delete_all(sess):
    s, t = sess
    # v<0 is TRUE only for k=2; k=3's NULL predicate row survives
    s.sql("DELETE FROM t WHERE v < 0.0")
    assert _rows(t.read(), "k") == [(1,), (3,), (4,)]
    s.sql("DELETE FROM t")
    assert t.read().count() == 0


def test_insert_into_values_and_overwrite(spark, sess):
    s, t = sess
    # positional bind + cast: VALUES yields (int, int, string) which
    # must coerce to the table's (long k, double v, string tag)
    entry = s.sql("INSERT INTO t VALUES (9, 9, 'ins'), (10, 0.5, 'ins')")
    assert entry["operation"] == "append"
    got = dict((r["k"], (r["v"], r["tag"])) for r in t.read().collect())
    assert got[9] == (9.0, "ins") and got[10] == (0.5, "ins")
    assert t.schema()["v"].dataType.simpleString() == "double"
    # INSERT INTO ... SELECT over a registered source view
    s.bind_source("pool9", spark.createDataFrame(
        [Row(k=20, v=1.0, tag="keep"), Row(k=21, v=-1.0, tag="drop")]
    ))
    s.sql("INSERT INTO t SELECT k, v, tag FROM pool9 WHERE v > 0.0")
    assert 20 in {r["k"] for r in t.read().collect()}
    assert 21 not in {r["k"] for r in t.read().collect()}
    # INSERT OVERWRITE replaces the whole table atomically
    s.sql("INSERT OVERWRITE t SELECT k, v, tag FROM pool9")
    assert _rows(t.read(), "k") == [(20,), (21,)]


def test_insert_loud_rejections(spark, sess):
    s, t = sess
    before = _rows(t.read())
    with pytest.raises(ValueError, match="arity"):
        s.sql("INSERT INTO t VALUES (1, 2.0)")
    with pytest.raises(ValueError, match="column list"):
        s.sql("INSERT INTO t (k, v) VALUES (1, 2.0)")
    with pytest.raises(ValueError, match="SELECT/VALUES/WITH"):
        s.sql("INSERT INTO t TABLE other")
    with pytest.raises(ValueError, match="unknown DML target"):
        s.sql("INSERT INTO missing VALUES (1, 2.0, 'x')")
    assert _rows(t.read()) == before


def test_loud_rejections(spark, sess, base_df):
    s, t = sess
    s.bind_source("src", base_df)
    cases = [
        ("SELECT * FROM t", "unsupported statement"),
        ("TRUNCATE TABLE t", "unsupported statement"),
        ("DELETE FROM t WHERE k = 1; DELETE FROM t", "one DML statement"),
        ("DELETE FROM missing WHERE k = 1", "unknown DML target"),
        ("MERGE INTO t USING nope ON t.k = nope.k "
         "WHEN MATCHED THEN UPDATE SET *", "unknown merge source"),
        ("MERGE INTO t USING src ON t.k < src.k "
         "WHEN MATCHED THEN UPDATE SET *", "non-equi"),
        ("MERGE INTO t USING src ON t.k = src.v "
         "WHEN MATCHED THEN UPDATE SET *", "same-named"),
        ("MERGE INTO t USING src ON t.k = src.k "
         "WHEN MATCHED AND t.v > 0 THEN UPDATE SET *", "unsupported MERGE"),
        ("MERGE INTO t USING src ON t.k = src.k "
         "WHEN NOT MATCHED THEN INSERT *", "WHEN MATCHED"),
        ("MERGE INTO t USING src ON t.k = src.k "
         "WHEN MATCHED THEN UPDATE SET v = s.v", "unsupported MERGE"),
        ("UPDATE t SET nope = 1", "unknown column"),
        ("UPDATE t SET v = 1.0, v = 2.0", "assigned twice"),
        ("UPDATE t SET v = 1.0 WHERE ", "empty WHERE"),
        ("UPDATE t, u SET v = 1.0", "unparsed tokens|identifier"),
        ("UPDATE t SET", "empty SET|malformed"),
    ]
    before = _rows(t.read())
    for stmt, pat in cases:
        with pytest.raises(ValueError, match=pat):
            s.sql(stmt)
    # every rejection left the table untouched
    assert _rows(t.read()) == before


def test_merge_source_column_mismatch_is_loud(spark, sess):
    s, t = sess
    s.bind_source("narrow", spark.createDataFrame([Row(k=1, v=2.0)]))
    with pytest.raises(ValueError, match="source columns"):
        s.sql("MERGE INTO t USING narrow ON t.k = narrow.k "
              "WHEN MATCHED THEN UPDATE SET * "
              "WHEN NOT MATCHED THEN INSERT *")


def test_update_delete_atomicity_version_count(sess):
    """Each statement is exactly ONE commit (atomicity contract)."""
    s, t = sess
    v0 = t.latest_version()
    s.sql("UPDATE t SET v = v + 1.0 WHERE k = 1")
    s.sql("DELETE FROM t WHERE k = 4")
    assert t.latest_version() == v0 + 2
