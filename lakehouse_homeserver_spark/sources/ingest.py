"""Incremental ELT core — reference parity with scripts/extract_load.py.

The reference's only engine code is a MinIO→Iceberg loader
(/root/reference/scripts/extract_load.py): list landing objects under
a prefix (:136-139), full load = latest file `createOrReplace`
(:145-152), incremental load = set-difference against a per-table
bookkeeping table then `append` + record the new files (:154-165),
create-if-absent (:106-110), empty source → clean no-op (:141-143),
snapshot GC per load (:167-171).

This module re-expresses those semantics Spark-natively with two
deliberate improvements over the reference (SURVEY.md §3.1 notes):

1. "Latest" file for a full load is explicit — (mtime, path) order —
   instead of bare lexicographic `sorted(list)[-1]` (:147).
2. The unseen-file check is a distributed left-anti join against the
   bookkeeping table instead of a driver-side Python set difference
   (:155-156) — at 100 TB the landing listing can be millions of
   objects; an anti-join scales, a driver set doesn't.
3. The bare `except:` that treats *any* metadata failure as "nothing
   loaded yet" (:60-61) is narrowed to "table does not exist".

Table format seam: locally tables are session-catalog parquet tables
written with `saveAsTable` (V1 API — Spark's built-in catalog has no
V2 REPLACE support). On a cluster with Delta/Iceberg jars the same
call sites switch to `DataFrameWriterV2.createOrReplace()/append()`
with the reference's exact table options
(write.format.default=parquet, format-version=2, :95-110); the seam
is `TableFormat`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC_NS = "src"
META_NS = "metadata"


@dataclass
class TableFormat:
    """Write-path seam (SURVEY.md §1.4). `parquet` locally; swap
    `delta`/`iceberg` + catalog conf on a real cluster."""

    name: str = "parquet"

    def create_or_replace(self, df: DataFrame, table: str) -> None:
        df.write.format(self.name).mode("overwrite").saveAsTable(table)

    def append(self, df: DataFrame, table: str) -> None:
        df.write.format(self.name).mode("append").saveAsTable(table)


class Lakehouse:
    """The ELT entry point (reference CLI equivalent, README.md:52-61)."""

    def __init__(
        self,
        spark: SparkSession,
        fmt: TableFormat | None = None,
        source_format: str = "parquet",
    ):
        self.spark = spark
        self.fmt = fmt or TableFormat()
        # landing-file format: parquet (reference parity), or json/csv
        # for extractors that drop those (schema inferred on read,
        # same schema-on-read contract either way)
        self.source_format = source_format
        # A8: CREATE NAMESPACE IF NOT EXISTS (extract_load.py:79)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {SRC_NS}")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {META_NS}")

    # -- source discovery (A2) ---------------------------------------------
    def list_landing_files(self, landing_dir: str, table: str) -> list[str]:
        """Candidate files under the table's landing prefix, like
        `list_objects(bucket, prefix=f"airbyte/{t}/")` (:136-139).

        Driver-side listing is fine: it returns paths, not data. On
        S3 this becomes a paginated prefix listing; for millions of
        objects prefer the Structured Streaming file source (see
        streaming/) which tracks processed files natively.
        """
        prefix = os.path.join(landing_dir, table)
        if not os.path.isdir(prefix):
            return []
        suffix = "." + self.source_format
        return sorted(
            os.path.join(prefix, f)
            for f in os.listdir(prefix)
            if f.endswith(suffix)
        )

    # -- bookkeeping (A3/A4: extract_load.py:55-66) ------------------------
    def _bookkeeping_table(self, table: str) -> str:
        return f"{META_NS}.{table}_loaded_files"

    def loaded_files(self, table: str) -> DataFrame:
        """file_path list already ingested; empty DF if never loaded.

        Narrowed failure handling vs the reference's bare `except:`
        (:60-61): only "table missing" means "nothing loaded yet".
        """
        bk = self._bookkeeping_table(table)
        if not self.spark.catalog.tableExists(bk):
            return self.spark.createDataFrame([], "file_path string")
        return self.spark.table(bk).select("file_path")

    def _record_loaded(self, table: str, file_paths: list[str]) -> None:
        df = self.spark.createDataFrame([(p,) for p in file_paths], ["file_path"])
        bk = self._bookkeeping_table(table)
        if self.spark.catalog.tableExists(bk):
            self.fmt.append(df, bk)
        else:
            self.fmt.create_or_replace(df, bk)

    # -- loads (A5/A6/A7: extract_load.py:75-110,118-165) ------------------
    def _read(self, paths: list[str]) -> DataFrame:
        """A1: multi-file scan, schema-on-read (:68-73). json/csv infer
        schema (csv with header) — same contract, different codec."""
        if self.source_format == "parquet":
            return self.spark.read.parquet(*paths)
        if self.source_format == "json":
            return self.spark.read.json(list(paths))
        if self.source_format == "csv":
            return self.spark.read.csv(list(paths), header=True, inferSchema=True)
        raise ValueError(f"unsupported source format {self.source_format!r}")

    def load_full(self, table: str, landing_dir: str) -> int:
        """Full load: newest landing file replaces the table (:145-152).

        "Newest" is (mtime, path) — explicit, unlike the reference's
        lexicographic sort. Returns rows loaded; 0 = empty-source
        no-op (:141-143).
        """
        files = self.list_landing_files(landing_dir, table)
        if not files:
            return 0
        latest = max(files, key=lambda p: (os.path.getmtime(p), p))
        df = self._read([latest])
        n = df.count()
        if n == 0:
            return 0
        self.fmt.create_or_replace(df, f"{SRC_NS}.{table}")
        # Full load resets bookkeeping to exactly the loaded file.
        bk = self._bookkeeping_table(table)
        self.fmt.create_or_replace(
            self.spark.createDataFrame([(latest,)], ["file_path"]), bk
        )
        return n

    def load_incremental(self, table: str, landing_dir: str) -> int:
        """Incremental: append only never-seen files (:154-165).

        The unseen-file set is computed as a left-anti join so the
        landing listing never has to fit in driver memory as a
        Python set. Re-running with no new files is a 0-row no-op —
        the idempotence contract the reference's race-prone
        read-modify-write only approximates.
        """
        files = self.list_landing_files(landing_dir, table)
        if not files:
            return 0
        candidates = self.spark.createDataFrame(
            [(p,) for p in files], ["file_path"]
        )
        new_files_df = candidates.join(
            F.broadcast(self.loaded_files(table)), "file_path", "left_anti"
        )
        new_files = [r.file_path for r in new_files_df.collect()]
        if not new_files:
            return 0
        df = self._read(new_files)
        n = df.count()
        if n == 0:
            return 0
        target = f"{SRC_NS}.{table}"
        if self.spark.catalog.tableExists(target):
            self.fmt.append(df, target)
        else:
            self.fmt.create_or_replace(df, target)
        self._record_loaded(table, new_files)
        return n

    # -- maintenance (A10: extract_load.py:167-171) ------------------------
    def expire_snapshots(self, table: str, retain_days: int = 3) -> None:
        """Snapshot GC seam. The reference calls
        `iceberg.system.expire_snapshots(..., now-3d)` after every
        load; plain parquet tables have no snapshot lineage, so this
        is a no-op locally. With Delta: `VACUUM {t} RETAIN n HOURS`;
        with Iceberg jars: the identical CALL.
        """
        if self.fmt.name == "delta":
            self.spark.sql(
                f"VACUUM {SRC_NS}.{table} RETAIN {retain_days * 24} HOURS"
            )

    def table(self, table: str) -> DataFrame:
        return self.spark.table(f"{SRC_NS}.{table}")

    def compact(self, table: str, target_files: int = 1) -> int:
        """Small-file compaction (the OPTIMIZE every lakehouse needs):
        incremental appends leave one file per load; rewrite the table
        into target_files files. At cluster scale target_files ≈
        table_bytes / 512 MiB. Returns the row count (sanity echo).

        Implementation note: Spark refuses to overwrite a table that
        its own plan reads (UNSUPPORTED_OVERWRITE) — `localCheckpoint`
        materializes the rows and severs the lineage so the rewrite is
        a plain write. (On a cluster with unreliable executors, stage
        through a temp table instead.)
        """
        target = f"{SRC_NS}.{table}"
        df = self.spark.table(target).localCheckpoint(eager=True)
        n = df.count()
        self.fmt.create_or_replace(df.coalesce(target_files), target)
        return n

    def optimize_layout(self, table: str, sort_cols: list[str]) -> None:
        """Rewrite the table range-partitioned + sorted on sort_cols so
        parquet row-group min/max stats become selective — the poor
        man's Z-ORDER (single-dimension clustering). Filters on the
        sort prefix then skip row groups at scan time.
        """
        target = f"{SRC_NS}.{table}"
        df = self.spark.table(target).localCheckpoint(eager=True)
        rewritten = df.repartitionByRange(*sort_cols).sortWithinPartitions(
            *sort_cols
        )
        self.fmt.create_or_replace(rewritten, target)


def main(argv: list[str] | None = None) -> int:
    """CLI mirroring the reference's entry point (README.md:56-61):

        python -m lakehouse_homeserver_spark.sources.ingest \\
            <table> <full|incremental> [landing_dir] [--format parquet|json|csv]

    Same contract: empty source → clean exit 0 (:141-143); any error →
    traceback + exit 1 (:176-180); per-load snapshot GC (:167-171).
    """
    import argparse
    import traceback

    from ..session import get_spark

    p = argparse.ArgumentParser(prog="ingest")
    p.add_argument("table")
    p.add_argument("load_type", choices=["full", "incremental"])
    p.add_argument("landing_dir", nargs="?", default="./landing")
    p.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])
    args = p.parse_args(argv)

    # Persistent catalog for cross-run state (the reference uses a
    # REST catalog + Postgres for the same reason, extract_load.py:42-46):
    # Spark's default in-memory catalog forgets tables between CLI
    # invocations while their warehouse dirs survive -> re-runs would
    # hit LOCATION_ALREADY_EXISTS. Hive catalogImplementation persists
    # the metastore (local Derby) next to the warehouse.
    spark = get_spark(
        app_name=f"ingest-{args.table}",
        extra_conf={"spark.sql.catalogImplementation": "hive"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        lh = Lakehouse(spark, source_format=args.format)
        if args.load_type == "full":
            n = lh.load_full(args.table, args.landing_dir)
        else:
            n = lh.load_incremental(args.table, args.landing_dir)
        if n == 0:
            print(f"{args.table}: no new data — nothing to do")
            return 0
        lh.expire_snapshots(args.table)
        print(f"{args.table}: loaded {n} rows ({args.load_type})")
        return 0
    except Exception:
        traceback.print_exc()
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
