"""SparkSession factory.

Reference parity: the reference builds its session from a conf block
wiring an Iceberg REST catalog + s3a credentials
(/root/reference/scripts/extract_load.py:26-52). We keep the same
shape — a single factory that layers (defaults | format seam | user
overrides) — but local-first: built-in session catalog, local
warehouse dir, parquet tables. The ``extra_conf`` seam is where the
exact Iceberg/S3 settings would be applied unchanged on a real
cluster.

Scale notes
-----------
- AQE on (coalesce partitions, skew-join) — the runtime re-planner is
  what makes a static plan survive a 100× scale-up.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a 1000-executor cluster this would be set to ~2-3× total cores.
  AQE coalesces down when partitions are small, so erring high is safe.
- Arrow enabled for any pandas-UDF path (vectorized Python transfer).
- Session timezone pinned to UTC so timestamp semantics are stable
  across driver, executors, and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def default_conf() -> dict[str, str]:
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": DEFAULT_SHUFFLE_PARTITIONS,
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # 128 MiB input splits: big enough to amortize task overhead,
        # small enough that a 100 TB scan still yields ~800k tasks —
        # fine for a 1000-executor cluster, and AQE coalesces outputs.
        "spark.sql.files.maxPartitionBytes": "134217728",
        # Broadcast threshold: dims like region/nation/supplier stay
        # broadcastable; AQE also converts to broadcast at runtime
        # when post-shuffle stats come in under the bound.
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.parquet.filterPushdown": "true",
        # Python DataSource V2 filter pushdown (Spark 4.1): lets
        # `SnapshotReader.pushFilters` prune whole data files via the
        # manifest's footer stats + blooms before the scan plans.
        "spark.sql.python.filterPushdown.enabled": "true",
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects; read as raw nanos (long) and convert to a µs
        # timestamp in the source registry (matches DuckDB truncation).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }


def get_spark(
    app_name: str = "lakehouse-homeserver-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for tests and
    bench; on a cluster, leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = {**default_conf(), **(extra_conf or {})}
    if master.startswith("local"):
        # In local mode ONE driver heap is the whole cluster; Spark's
        # 1g default starves 32 concurrent tasks (GC-locker stalls,
        # then OOM on array-heavy ops at 10x corpus in the scaling
        # smoke). On a real cluster spark-submit owns this knob, so
        # it is only set for self-built local sessions (static conf —
        # must be set before the JVM starts).
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine defaults to an externally-provided session.

    The driver harness hands us a session it built; runtime-settable
    confs (AQE, timezone, shuffle partitions) are applied here so
    query semantics match `get_spark` sessions.
    """
    from pyspark.errors import AnalysisException

    for k, v in default_conf().items():
        try:
            spark.conf.set(k, v)
        except AnalysisException as e:
            # Only static confs are expected to be un-settable on a
            # live session; anything else (typo'd key, bad value)
            # must surface — a silently-missed conf changes query
            # semantics (e.g. timezone) in ways the oracle catches 50
            # queries later with no cause attached.
            if "static" not in str(e).lower():
                raise
    _ship_package(spark)
    return spark


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to the executors' python workers.

    Pandas-UDF closures are cloudpickled **by reference** (module +
    qualname), so the worker process must be able to import
    ``lakehouse_homeserver_spark`` — which fails when the driver
    process runs from an arbitrary cwd (the harness does) and on any
    real cluster where the package isn't pre-installed on executors.
    ``sc.addPyFile`` of a package zip is the standard deployment path
    (same mechanism as ``spark-submit --py-files``); content-hashed
    filename keeps the call idempotent across sessions and edits.
    """
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    sources = []
    for dirpath, _dirnames, filenames in sorted(os.walk(pkg_dir)):
        for f in sorted(filenames):
            if f.endswith(".py"):
                sources.append(os.path.join(dirpath, f))
    digest = hashlib.md5()
    for path in sources:
        with open(path, "rb") as fh:
            digest.update(path.encode())
            digest.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_homeserver_spark-{digest.hexdigest()[:12]}.zip",
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for path in sources:
                arc = os.path.join(
                    "lakehouse_homeserver_spark",
                    os.path.relpath(path, pkg_dir),
                )
                zf.write(path, arc)
        os.replace(tmp, zpath)  # atomic vs concurrent test workers
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id)
