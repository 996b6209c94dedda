"""REST catalog service tests: route shapes, 404 envelope, manifest
correctness vs the snapshot log, and engine read parity."""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from lakehouse_homeserver_spark.sources import load_table as T
from lakehouse_homeserver_spark.sources.restcat import CatalogServer, RestCatalog
from lakehouse_homeserver_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def catalog(spark, sf_dir, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "nation"))
    nations = T(spark, sf_dir, "nation")
    t.create(nations.repartition(2))
    t.delete_where(F.col("n_nationkey") % 5 == 0)
    with CatalogServer() as server:
        server.register("analytics", "nation", t.path)
        yield server, t


def test_config_and_listings(catalog):
    server, _ = catalog
    cat = RestCatalog(server.uri)
    assert cat.config == {"defaults": {}, "overrides": {}}
    assert cat.list_namespaces() == ["analytics"]
    assert cat.list_tables("analytics") == ["nation"]


def test_load_table_serves_live_manifest_only(catalog):
    """The served scan plan must match the log head's manifest — NOT
    the data directory listing, which still holds the CoW delete's
    stranded pre-delete files."""
    import os

    server, t = catalog
    meta = RestCatalog(server.uri).load_table("analytics", "nation")
    head = t.entry(t.latest_version())
    assert meta["x-manifest"] == head["manifest"]
    assert meta["metadata"]["current-snapshot-id"] == t.latest_version()
    assert meta["metadata"]["location"] == t.path
    on_disk = [
        f for f in os.listdir(os.path.join(t.path, "data"))
        if f.endswith(".parquet")
    ]
    assert len(on_disk) > len(meta["x-manifest"])  # orphans exist
    assert meta["metadata-location"].endswith(
        f"{t.latest_version():020d}.json"
    )


def test_read_table_matches_native_read(spark, catalog):
    server, t = catalog
    via_http = (
        RestCatalog(server.uri)
        .read_table(spark, "analytics", "nation")
        .groupBy()
        .agg(F.count(F.lit(1)), F.sum("n_nationkey"))
        .collect()
    )
    native = (
        t.read().groupBy().agg(F.count(F.lit(1)), F.sum("n_nationkey")).collect()
    )
    assert via_http == native


@pytest.mark.parametrize(
    "route",
    [
        "/v1/namespaces/nope",
        "/v1/namespaces/nope/tables",
        "/v1/namespaces/analytics/tables/nope",
        "/v2/anything",
    ],
)
def test_unknown_objects_404_with_error_envelope(catalog, route):
    server, _ = catalog
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server.uri + route, timeout=10)
    assert ei.value.code == 404
    body = json.loads(ei.value.read())
    assert body["error"]["code"] == 404


def test_server_stop_frees_port(catalog):
    server, t = catalog
    uri = server.uri
    server.stop()
    with pytest.raises(Exception):
        urllib.request.urlopen(uri + "/v1/config", timeout=2)
    # restart for the fixture's context-manager exit (stop is idempotent)
    server.start()


# -- r5: SQL-backed persistence + OAuth (SURVEY missing-#1 seams) ----------


@pytest.fixture()
def sql_catalog(spark, tmp_path):
    """Snapshot table + sqlite store + authenticated server."""
    from lakehouse_homeserver_spark.sources.restcat import SqlCatalogStore

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(spark.range(10).withColumnRenamed("id", "k"))
    db = str(tmp_path / "cat.db")
    server = CatalogServer(
        store=SqlCatalogStore(db), credential=("cid", "sec")
    )
    server.start()
    yield server, db, str(tmp_path / "t")
    server.stop()


def test_oauth_gate_401s_without_token(sql_catalog):
    server, _, _ = sql_catalog
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server.uri + "/v1/namespaces", timeout=10)
    assert ei.value.code == 401
    assert json.loads(ei.value.read())["error"]["code"] == 401


def test_oauth_rejects_bad_credentials(sql_catalog):
    server, _, _ = sql_catalog
    with pytest.raises(urllib.error.HTTPError) as ei:
        RestCatalog(server.uri, credential=("cid", "WRONG"))
    assert ei.value.code == 401


def test_oauth_token_grants_access_and_config_stays_open(sql_catalog):
    server, _, tpath = sql_catalog
    # config is pre-auth by spec (clients need it to find the token route)
    with urllib.request.urlopen(server.uri + "/v1/config", timeout=10) as r:
        assert json.loads(r.read()) == {"defaults": {}, "overrides": {}}
    cat = RestCatalog(server.uri, credential=("cid", "sec"))
    cat.create_namespace("ns")
    cat.register_table("ns", "t", tpath)
    assert cat.list_tables("ns") == ["t"]


def test_expired_token_is_rejected_and_evicted(sql_catalog):
    """ADVICE r5: tokens must honor the advertised expires_in — an
    expired bearer gets the 401 envelope and leaves the token set
    (no unbounded growth)."""
    server, _, _ = sql_catalog
    cat = RestCatalog(server.uri, credential=("cid", "sec"))
    assert cat.list_namespaces() == []  # live token works
    # force expiry of every outstanding token
    for t in list(server._tokens):
        server._tokens[t] = 0.0
    with pytest.raises(urllib.error.HTTPError) as ei:
        cat.list_namespaces()
    assert ei.value.code == 401
    assert server._tokens == {}  # evicted on check


def test_catalog_resolved_format_scan(spark, sql_catalog):
    """r6 (VERDICT r5 #8): `format("snapshot")` resolves the table
    THROUGH the REST catalog — entry and location off the loadTable
    wire (x-entry), OAuth credential threaded via option, local _log
    never consulted by the reader; version options are rejected."""
    from lakehouse_homeserver_spark.sources.pyds import SnapshotDataSource

    server, _, tpath = sql_catalog
    cat = RestCatalog(server.uri, credential=("cid", "sec"))
    cat.create_namespace("ns")
    cat.register_table("ns", "t", tpath)
    spark.dataSource.register(SnapshotDataSource)
    reader = (
        spark.read.format("snapshot")
        .option("catalog_uri", server.uri)
        .option("catalog_credential", "cid:sec")
        .option("catalog_namespace", "ns")
        .option("catalog_table", "t")
    )
    assert sorted(r.k for r in reader.load().collect()) == list(range(10))
    with pytest.raises(Exception, match="current snapshot"):
        reader.option("version", "1").load().collect()


def test_wire_ddl_validates_register_target(sql_catalog):
    server, _, _ = sql_catalog
    cat = RestCatalog(server.uri, credential=("cid", "sec"))
    cat.create_namespace("ns")
    with pytest.raises(urllib.error.HTTPError) as ei:
        cat.register_table("ns", "bogus", "/tmp/definitely-not-a-table")
    assert ei.value.code == 400  # no snapshot log at the location


def test_sqlite_store_survives_server_restart(spark, sql_catalog):
    from lakehouse_homeserver_spark.sources.restcat import SqlCatalogStore

    server, db, tpath = sql_catalog
    cat = RestCatalog(server.uri, credential=("cid", "sec"))
    cat.create_namespace("ns")
    cat.register_table("ns", "t", tpath)
    server.stop()
    # brand-new server instance over the same sqlite file
    server2 = CatalogServer(
        store=SqlCatalogStore(db), credential=("cid", "sec")
    )
    server2.start()
    try:
        cat2 = RestCatalog(server2.uri, credential=("cid", "sec"))
        assert cat2.list_namespaces() == ["ns"]
        assert cat2.list_tables("ns") == ["t"]
        df = cat2.read_table(spark, "ns", "t")
        assert df.count() == 10
    finally:
        server2.stop()
    server.start()  # fixture teardown symmetry


def test_tokens_do_not_cross_server_instances(sql_catalog):
    """A bearer token is per-server state (like a real session token):
    a restarted catalog must not honor tokens minted by its
    predecessor."""
    from lakehouse_homeserver_spark.sources.restcat import SqlCatalogStore

    server, db, tpath = sql_catalog
    cat = RestCatalog(server.uri, credential=("cid", "sec"))
    old_token = cat._token
    server.stop()
    server2 = CatalogServer(
        store=SqlCatalogStore(db), credential=("cid", "sec")
    )
    server2.start()
    try:
        req = urllib.request.Request(server2.uri + "/v1/namespaces")
        req.add_header("Authorization", f"Bearer {old_token}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 401
    finally:
        server2.stop()
    server.start()


def test_load_table_resolves_manifest_sidecar(spark, sf_dir, tmp_path):
    """Regression: a table past ``manifest_inline_max`` live files
    stores its manifest in a `_log/manifests/` SIDECAR; `_read_head`
    once looked in `_log/_manifests/` and loadTable 500'd for exactly
    the at-scale tables the sidecar exists for. Certify the whole
    catalog-resolved path (loadTable AND read_table) on a sidecar'd
    table."""
    t = SnapshotTable(spark, str(tmp_path / "nation_big"), manifest_inline_max=2)
    nations = T(spark, sf_dir, "nation")
    t.create(nations.repartition(5))  # 5 files > inline max of 2
    head = t.entry(t.latest_version())
    assert len(head["manifest"]) > 2  # sidecar regime reached
    with CatalogServer() as server:
        server.register("analytics", "nation_big", t.path)
        cat = RestCatalog(server.uri)
        meta = cat.load_table("analytics", "nation_big")
        assert meta["x-manifest"] == head["manifest"]
        via_http = (
            cat.read_table(spark, "analytics", "nation_big")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("s"))
            .collect()
        )
        native = (
            t.read()
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("s"))
            .collect()
        )
        assert via_http == native


def test_read_table_applies_mor_deletes(spark, sf_dir, tmp_path):
    """Regression (r7 review): read_table planned from x-manifest
    alone, so MoR-deleted rows RESURFACED in the catalog-served scan
    (the delete files were served in x-entry but never applied). The
    served read must match the native read after an equality AND a
    positional MoR delete."""
    t = SnapshotTable(spark, str(tmp_path / "nation_mor"))
    t.create(T(spark, sf_dir, "nation").repartition(2))
    t.delete_where(
        F.col("n_nationkey") % 4 == 1, mode="mor", equality_on=["n_nationkey"]
    )
    t.delete_where(F.col("n_nationkey") % 5 == 2, mode="mor_positional")
    with CatalogServer() as server:
        server.register("analytics", "nation_mor", t.path)
        served = (
            RestCatalog(server.uri)
            .read_table(spark, "analytics", "nation_mor")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("s"))
            .collect()
        )
    native = (
        t.read()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("s"))
        .collect()
    )
    assert served == native
    # and the deletes really removed rows (the regression's symptom
    # was served > native)
    assert served[0]["n"] < 25


def test_inmemory_create_namespace_is_real(spark):
    """Regression (r7 review): CreateNamespace on a store-less server
    200'd and then 404'd the namespace it had just affirmed."""
    with CatalogServer() as server:
        cat = RestCatalog(server.uri)
        cat.create_namespace("fresh_ns")
        assert "fresh_ns" in cat.list_namespaces()
        assert cat.list_tables("fresh_ns") == []
