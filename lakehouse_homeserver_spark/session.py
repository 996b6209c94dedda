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

# Worker interpreter shim (optimization r13, guide §4 — see
# scripts/worker_python.sh for the measured numbers): freshly spawned
# Python workers import pyspark through $SPARK_HOME's pyspark.zip,
# paying ~1.3 s of zipimport bytecode compilation PER PROCESS — and
# the Python streaming source runner is one fresh process per stream.
# When the driver's own pyspark is a directory install (bytecode
# cache warm), the shim prepends it to the worker's PYTHONPATH so the
# same release imports in ~0.4 s. Results are unaffected: it is the
# identical pyspark version either way, only resolved from a path
# with a __pycache__.
_WORKER_SHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "worker_python.sh",
)


def _worker_shim_env(real_python: str) -> dict[str, str]:
    """Env the shim needs, or {} when it must not be used: driver
    pyspark lives in a zip/egg (no bytecode-cached dir to point at),
    the shim is missing, or the configured worker interpreter is a
    different major.minor than the driver's (its workers could not
    import the driver's install; Spark itself rejects such a mismatch
    at run time, but don't let the shim be the thing that breaks)."""
    import shutil
    import subprocess
    import sys

    import pyspark

    pkg_dir = os.path.dirname(os.path.abspath(pyspark.__file__))
    if not os.path.isdir(pkg_dir) or not os.access(_WORKER_SHIM, os.X_OK):
        return {}
    driver_ver = "%d.%d" % sys.version_info[:2]
    resolved = shutil.which(real_python)
    if resolved is None:
        return {}
    if os.path.realpath(resolved) != os.path.realpath(sys.executable):
        try:
            worker_ver = subprocess.run(
                [resolved, "-c", "import sys;print('%d.%d'%sys.version_info[:2])"],
                capture_output=True,
                text=True,
                timeout=30,
            ).stdout.strip()
        except (OSError, subprocess.SubprocessError):
            return {}
        if worker_ver != driver_ver:
            return {}
    return {
        "SPARK_GRAFT_PYSPARK_DIR": os.path.dirname(pkg_dir),
        "SPARK_GRAFT_REAL_PYTHON": real_python,
    }


def _install_worker_shim_env() -> None:
    """Export the shim env + PYSPARK_PYTHON before the JVM starts
    (get_spark path): the JVM inherits os.environ, and every
    PythonWorkerFactory spawn inherits the JVM's environment. The
    shim never changes WHICH interpreter runs (it execs the one that
    was configured, or the driver's own) — it only prepends the
    driver's bytecode-cached pyspark dir to the worker's PYTHONPATH."""
    import sys

    real = os.environ.get("PYSPARK_PYTHON") or sys.executable
    if os.path.realpath(real) == os.path.realpath(_WORKER_SHIM):
        return  # already installed
    env = _worker_shim_env(real)
    if not env:
        return
    for k, v in env.items():
        os.environ[k] = v
    os.environ["PYSPARK_PYTHON"] = _WORKER_SHIM


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
    _install_worker_shim_env()
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
    # Worker shim on an externally-built session: the JVM env is
    # already fixed, but `sc.pythonExec` is read (Python-side) when
    # each function/data source is wrapped, and `sc.environment` is
    # shipped as the worker's envVars — so functions created AFTER
    # tune_session spawn their workers through the shim. The shim
    # still execs the interpreter that was configured.
    sc = spark.sparkContext
    if os.path.realpath(sc.pythonExec) != os.path.realpath(_WORKER_SHIM):
        env = _worker_shim_env(sc.pythonExec)
        if env:
            sc.environment.update(env)
            sc.pythonExec = _WORKER_SHIM
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
