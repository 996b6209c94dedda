"""Iceberg-REST-shaped catalog service over snapshot tables.

SURVEY.md "What's missing" #1 is the reference's NETWORK catalog: its
compose file runs an Iceberg REST catalog container backed by
Postgres, and both engines resolve tables through it
(/root/reference/docker-compose.yml:8,18;
/root/reference/scripts/extract_load.py:42-46 wires
``spark.sql.catalog.lakehouse.type=rest``). That exact stack needs
infra this environment doesn't have — but the CONTRACT it provides
(any engine resolves namespaces/tables/snapshots over HTTP, then
reads the table's own files directly) doesn't need Postgres or
containers at all. This module provides that contract natively:

- :class:`CatalogServer` — a stdlib ``ThreadingHTTPServer`` on
  127.0.0.1 serving a subset of the public Apache Iceberg REST
  Catalog OpenAPI surface (GET config / namespaces / tables /
  loadTable), backed by snapshot-table commit logs on disk. The
  server is METADATA-ONLY, exactly like the real REST catalog: data
  bytes never travel through it — ``loadTable`` returns the table
  location + current snapshot's live-file manifest and the engine
  scans the files itself.
- :class:`RestCatalog` — a urllib client any Python engine embeds:
  list namespaces/tables, load table metadata, and (for Spark)
  ``read_table`` = plan the scan from the SERVED manifest.

Divergence from the real spec, kept deliberate and documented: the
real LoadTableResult points engines at Avro manifest files; our
format's JSON log entry already IS the scan plan, so the response
inlines the live-file manifest under the (clearly non-spec) key
``x-manifest`` next to the spec-shaped fields. Engines that only
want spec fields ignore it and read the snapshot log at
``metadata-location`` — which is how the DuckDB side of
``a47_rest_catalog`` proves the files stay engine-neutral.

No authentication: the server binds 127.0.0.1 only. The real spec's
OAuth surface is an environment seam here, like S3A credentials.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["CatalogServer", "RestCatalog"]


def _read_head(table_path: str) -> dict | None:
    """Current snapshot entry of a snapshot table, read WITHOUT a
    SparkSession (the catalog is a metadata service; it must not
    depend on an engine). Mirrors ``SnapshotTable.entry`` incl. the
    manifest-list sidecar indirection."""
    log_dir = os.path.join(table_path, "_log")
    if not os.path.isdir(log_dir):
        return None
    versions = sorted(
        int(f[:-5])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and not f.startswith(".")
    )
    if not versions:
        return None
    with open(os.path.join(log_dir, f"{versions[-1]:020d}.json")) as fh:
        entry = json.load(fh)
    ref = entry.pop("manifest_ref", None)
    if ref is not None:
        with open(os.path.join(log_dir, "_manifests", ref)) as fh:
            entry.update(json.load(fh))
    return entry


class CatalogServer:
    """Serve registered snapshot tables over the Iceberg REST shape.

    Routes (subset of the public REST catalog OpenAPI):

    - ``GET /v1/config`` → ``{"defaults": {}, "overrides": {}}``
    - ``GET /v1/namespaces`` → ``{"namespaces": [[ns], ...]}``
    - ``GET /v1/namespaces/{ns}/tables`` → ``{"identifiers": [...]}``
    - ``GET /v1/namespaces/{ns}/tables/{t}`` → LoadTableResult shape:
      ``metadata-location``, ``metadata`` (``location``,
      ``current-snapshot-id``, ``schemas``/``current-schema-id``,
      ``properties``) plus the non-spec ``x-manifest`` scan plan.

    Unknown namespace/table → 404 with the spec's error envelope.
    """

    def __init__(self) -> None:
        self._tables: dict[tuple[str, str], str] = {}
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def register(self, namespace: str, name: str, table_path: str) -> None:
        self._tables[(namespace, name)] = table_path

    # -- request handling --------------------------------------------------
    def _route(self, path: str) -> tuple[int, dict]:
        parts = [p for p in path.split("/") if p]
        if parts[:1] != ["v1"]:
            return 404, _err(404, f"unknown route {path}")
        parts = parts[1:]
        if parts == ["config"]:
            return 200, {"defaults": {}, "overrides": {}}
        if parts == ["namespaces"]:
            spaces = sorted({ns for ns, _ in self._tables})
            return 200, {"namespaces": [[ns] for ns in spaces]}
        if len(parts) == 2 and parts[0] == "namespaces":
            ns = parts[1]
            if all(k != ns for k, _ in self._tables):
                return 404, _err(404, f"namespace {ns} not found")
            return 200, {"namespace": [ns], "properties": {}}
        if len(parts) == 3 and parts[0] == "namespaces" and parts[2] == "tables":
            ns = parts[1]
            if all(k != ns for k, _ in self._tables):
                return 404, _err(404, f"namespace {ns} not found")
            idents = [
                {"namespace": [k], "name": n}
                for (k, n) in sorted(self._tables)
                if k == ns
            ]
            return 200, {"identifiers": idents}
        if len(parts) == 4 and parts[0] == "namespaces" and parts[2] == "tables":
            ns, name = parts[1], parts[3]
            tpath = self._tables.get((ns, name))
            if tpath is None:
                return 404, _err(404, f"table {ns}.{name} not found")
            head = _read_head(tpath)
            if head is None:
                return 404, _err(404, f"table {ns}.{name} has no snapshots")
            version = head["version"]
            return 200, {
                "metadata-location": os.path.join(
                    tpath, "_log", f"{version:020d}.json"
                ),
                "metadata": {
                    "format-version": 2,
                    "location": tpath,
                    "current-snapshot-id": version,
                    "current-schema-id": version,
                    "schemas": [
                        dict(
                            json.loads(head["schema"]), **{"schema-id": version}
                        )
                    ],
                    "properties": head.get("properties", {}),
                },
                "config": {},
                "x-manifest": head["manifest"],
            }
        return 404, _err(404, f"unknown route {path}")

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> str:
        """Bind 127.0.0.1 on an ephemeral port; return the base URI."""
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib contract)
                try:
                    code, body = outer._route(self.path.split("?", 1)[0])
                except Exception as e:  # pragma: no cover - defensive
                    code, body = 500, _err(500, repr(e))
                payload = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a) -> None:  # quiet
                pass

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.uri

    @property
    def uri(self) -> str:
        assert self._httpd is not None, "server not started"
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
            self._thread = None

    def __enter__(self) -> "CatalogServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


def _err(code: int, message: str) -> dict:
    return {
        "error": {"message": message, "type": "NoSuchObjectException", "code": code}
    }


class RestCatalog:
    """Engine-embeddable client for :class:`CatalogServer` (and, by
    construction, for the matching subset of any real Iceberg REST
    endpoint)."""

    def __init__(self, uri: str) -> None:
        self.uri = uri.rstrip("/")
        # One config round-trip on connect, like real clients.
        self.config = self._get("/v1/config")

    def _get(self, route: str) -> dict:
        with urllib.request.urlopen(self.uri + route, timeout=30) as resp:
            return json.loads(resp.read())

    def list_namespaces(self) -> list[str]:
        return [ns[0] for ns in self._get("/v1/namespaces")["namespaces"]]

    def list_tables(self, namespace: str) -> list[str]:
        out = self._get(f"/v1/namespaces/{namespace}/tables")
        return [i["name"] for i in out["identifiers"]]

    def load_table(self, namespace: str, name: str) -> dict:
        return self._get(f"/v1/namespaces/{namespace}/tables/{name}")

    def read_table(self, spark, namespace: str, name: str):
        """Plan a Spark scan from the SERVED metadata: location +
        live-file manifest over HTTP, then a direct parquet read of
        exactly those files — data bytes never touch the catalog,
        the defining property of the REST-catalog architecture."""
        meta = self.load_table(namespace, name)
        loc = meta["metadata"]["location"]
        files = [
            os.path.join(loc, "data", f) for f in meta["x-manifest"]
        ]
        return spark.read.parquet(*files)
