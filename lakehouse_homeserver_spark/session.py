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
    return spark
