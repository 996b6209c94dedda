"""Time-series operators over the events stream table — SURVEY.md C6/C7/I2/I3.

The reference wires a full SQL surface over its tables
(/root/reference/README.md:66-98) but has no time-series operators of
its own; these are the engine extensions SURVEY.md §2.C7/§2.I calls
for, implemented as batch DataFrame compositions (their streaming
twins live in ``streaming/``).

Scale design: every operator here is a single window pass or a single
shuffle on (user_id | bucket) — no self-joins, no driver loops. The
as-of join is the classic union-trick (one sort, no range explosion);
sliding windows explode to exactly ceil(w/s) rows per event.

Timestamps in outputs are epoch-microsecond BIGINTs — representation-
stable across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table as T
from .common import dsum, sql_dsum

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

HOUR_US = 3_600_000_000
MIN15_US = 900_000_000
MIN_US = 60_000_000


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@query(
    "c7_asof_join",
    oracle="""
    SELECT p.event_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS last_click_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def c7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it
    (SURVEY C7).

    Spark has no ASOF JOIN; the scalable encoding is the union trick:
    one dataset, one window sorted by time per user, running MAX of
    click-time with a RANGE frame (ties in ts handled exactly like
    ASOF's ``>=``). Cost: a single shuffle on user_id + one sort —
    no range-join explosion, no per-row subquery; this survives 100 TB
    because it's the same plan shape as any windowed aggregation.
    """
    e = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    ts_us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    click_us = F.when(F.col("event_type") == "click", ts_us)
    return (
        e.withColumn("last_click_us", F.max(click_us).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            ts_us.alias("purchase_us"),
            "last_click_us",
        )
    )


@query(
    "ts_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {30 * MIN_US}
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS start_us,
           MAX(epoch_us(ts)) AS end_us,
           {sql_dsum('value')} AS sum_value
    FROM numbered GROUP BY user_id, session_idx
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) — SURVEY I3's
    batch twin. lag → flag → running-sum → group: two window passes
    over one user_id shuffle, the textbook scalable encoding.
    """
    e = T(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tie-breaker: with duplicate ts, peer order under a ROWS
    # frame is engine-unspecified — a session-opening row could land
    # on either side of its twin and shift every session_idx after it.
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gap = 30 * MIN_US
    flagged = e.withColumn(
        "new_sess",
        F.when(
            (ts_us - F.lag(ts_us).over(w) > gap)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn("session_idx", F.sum("new_sess").over(run))
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
        dsum("value").alias("sum_value"),
    )


@query(
    "i2_tumbling_window",
    oracle=f"""
    SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start_us,
           event_type,
           COUNT(*) AS cnt,
           {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def i2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation (SURVEY I2, batch twin of
    the streaming job in streaming/jobs.py)."""
    e = T(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@query(
    "i2_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT (epoch_us(ts) // {MIN15_US} - j) * {MIN15_US} AS window_start_us,
             epoch_us(ts) AS e_us, value
      FROM events, UNNEST(generate_series(0, 3)) AS t(j)
    )
    SELECT window_start_us, COUNT(*) AS cnt, {sql_dsum('value')} AS sum_value
    FROM slid
    WHERE window_start_us + {HOUR_US} > e_us
    GROUP BY window_start_us
    """,
)
def i2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 15 min slide) — each event lands in
    exactly ≤4 windows; Spark's ``window()`` does the controlled
    explode (SURVEY I2)."""
    e = T(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "cnt",
            "sum_value",
        )
    )


@query(
    "ts_gap_fill",
    oracle=f"""
    WITH bounds AS (
      SELECT (MIN(epoch_us(ts)) // {HOUR_US}) * {HOUR_US} AS lo,
             (MAX(epoch_us(ts)) // {HOUR_US}) * {HOUR_US} AS hi
      FROM events
    ), buckets AS (
      SELECT UNNEST(generate_series(lo, hi, {HOUR_US})) AS bucket_us FROM bounds
    ), agg AS (
      SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS bucket_us,
             COUNT(*) AS c
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT b.bucket_us, COALESCE(a.c, 0) AS cnt
    FROM buckets b LEFT JOIN agg a ON b.bucket_us = a.bucket_us
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series (hypertable-style dense rollup).

    The bucket spine is generated distributively with
    ``sequence()`` + ``explode`` from a 1-row min/max aggregate —
    no driver-side range loop — then left-joined to the sparse
    aggregate. The sparse side is tiny post-agg, so AQE broadcasts it.
    """
    e = T(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    bucket = (ts_us / F.lit(HOUR_US)).cast("bigint") * HOUR_US
    bounds = e.agg(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(HOUR_US))).alias("bucket_us")
    )
    agg = (
        e.filter(F.col("event_type") == "error")
        .groupBy(bucket.alias("bucket_us"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return spine.join(agg, "bucket_us", "left").select(
        "bucket_us", F.coalesce("c", F.lit(0)).cast("bigint").alias("cnt")
    )


@query(
    "ts_rollup_day_hour",
    oracle=f"""
    SELECT CAST(STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS VARCHAR) AS day,
           EXTRACT(hour FROM ts) AS hour,
           GROUPING(EXTRACT(hour FROM ts)) AS gid,
           COUNT(*) AS cnt, {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((1, 2), (1))
    """,
)
def ts_rollup_day_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (hour detail + day summary) via
    GROUPING SETS — the continuous-aggregate/hypertable-rollup
    pattern in one pass (SURVEY D4 applied to time)."""
    e = T(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("bigint").alias("hour"),
        "value",
    )
    e.createOrReplaceTempView("_ts_rollup_src")
    return spark.sql(
        """
        SELECT day, hour, grouping(hour) AS gid,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM _ts_rollup_src
        GROUP BY GROUPING SETS ((day, hour), (day))
        """
    )


@query(
    "ts_rich_sessions",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {30 * MIN_US}
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM flagged
    )
    SELECT user_id,
           MIN(epoch_us(ts)) AS session_start_us,
           MAX(epoch_us(ts)) + {30 * MIN_US} AS session_end_us,
           COUNT(*) AS n_events,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type)
               AS event_types,
           SUM(cents) AS value_cents
    FROM numbered GROUP BY user_id, sess_no
    """,
)
def ts_rich_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/stateful.rich_sessions (custom-payload
    sessionization: distinct-type set + exact cents sum per session).
    Registered with an oracle so the custom stateful operator's
    semantics are SQL-cross-checked even though the streaming
    execution itself is checkpoint-driven (tests/test_streaming.py
    proves stream == this batch twin)."""
    from ..streaming.stateful import batch_rich_sessions

    return batch_rich_sessions(T(spark, sf_dir, "events"))


@query(
    "ts_attribution_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(p.ts) AS p_us,
           epoch_us(c.ts) AS c_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def ts_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/jobs.interval_join (SURVEY §2.I ext.):
    purchases attributed to same-user clicks within the preceding 30
    minutes. The equi-key (user_id) keeps this a hash join with a
    range residual — never a cross product — and the identical
    function body runs as the watermarked stream-stream join
    (tests/test_streaming.py proves stream == batch on the emitted
    frontier). Output is all-pairs within the window by design
    (multi-touch attribution); first/last-touch is one
    WindowGroupLimit away.
    """
    from ..streaming.jobs import interval_join

    e = T(spark, sf_dir, "events")
    joined = interval_join(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") == "click"),
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.unix_micros("p_ts").alias("p_us"),
        F.unix_micros("c_ts").alias("c_us"),
    )
