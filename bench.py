"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-collect (no driver-side
row transfer beyond the aggregate) so the timing covers scan → shuffle
→ result, the same work a cluster run would do.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_homeserver_spark.registry import all_queries
from lakehouse_homeserver_spark.session import get_spark

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(app_name="lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    only = sys.argv[1:]
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    # Warm up one-time process machinery so the alphabetically-first
    # queries aren't charged for it: JVM/codegen, parquet footer
    # caches, the Python UDF worker daemons (one per core — measured
    # ~5 s billed to the first pandas query otherwise), the noop sink
    # used for materialization, and the parquet write committer.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    warm = spark.range(32_000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    warm.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    import tempfile

    with tempfile.TemporaryDirectory(prefix="bench-warm-") as d:
        spark.range(100).write.mode("overwrite").parquet(os.path.join(d, "w"))

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(queries.items()):
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        # Materialize every row without shipping rows to the driver.
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
