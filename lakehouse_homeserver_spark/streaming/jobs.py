"""Structured Streaming jobs — SURVEY.md §2.I.

The reference implements incrementality as batch re-runs of a
file-diff loop with a hand-rolled bookkeeping table
(/root/reference/scripts/extract_load.py:154-165). Structured
Streaming's file source IS that mechanism, built in: it tracks
processed files in the checkpoint, delivers each file exactly once,
and restarts resume from the checkpoint (SURVEY.md I1). The jobs
here generalize the reference's contract to continuous processing:

- I1 `stream_ingest`     : landing dir → table, exactly-once.
- I2 `stream_tumbling_counts`: watermarked tumbling-window aggs.
- I3 `stream_session_windows`: gap-based session windows.
- I4 : watermarks on every stateful job (late data policy).
- I5 `stream_dedup`      : stateful dedup within the watermark.
- I6 : every job sinks via `writeStream` to parquet tables.

All jobs default to `Trigger.AvailableNow` so the same code runs as
an incremental batch (the reference's cron-style usage, README.md:56-61)
or continuously by passing a processing-time trigger.

Scale notes: state stores are keyed by (window/key) and bounded by
the watermark — the 1-hour delay bounds state to ~watermark/window
buckets per key; file-source listing cost is amortized with
`maxFilesPerTrigger` on huge landing prefixes.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def await_or_raise(q: StreamingQuery, timeout_s: int = 300) -> None:
    """`awaitTermination(timeout)` returns False on timeout — callers
    that ignore it would read a possibly partial sink and certify
    incomplete results (ADVICE r5 low on i8/i11). Stop the hung query
    and fail loudly instead."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} still running after "
            f"{timeout_s}s — refusing to read a partial sink"
        )


@contextmanager
def pinned_shuffle(spark: SparkSession, n: str = "8"):
    """Pin `spark.sql.shuffle.partitions` around a streaming
    certification run (restored in finally). The streaming certs'
    dominant cost is per-partition state-store lifecycle
    (open/commit x partitions x micro-batches), not data volume --
    measured on i12: 32->8 partitions cut the run 17.3->10.8 s with
    identical results. Checkpoints are fresh per call, so the pinned
    value never conflicts with a prior run's state layout; on a real
    cluster size this to the executor count instead."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", n)
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def scaled_state_partitions(
    sf_dir: str,
    table: str = "events",
    rows_per_partition: int = 12_500,
    lo: int = 8,
    hi: int | None = None,
) -> str:
    """Scale-ADAPTIVE state-partition pin for stateful streaming
    certs (optimization r13, guide §2: derive partitioning from input
    size instead of a constant tuned for one scale factor).

    Measured on the rich-sessionizer (i12): at sf0.1 (100 k events)
    8 partitions beat 16/32 (medians 10.6 / 11.2 / 12.3 s — the
    per-partition state-store lifecycle dominates), but on the 10×
    clone (1 M events) the same pin CAPS the summed per-key Python
    time at 8-way and 32 partitions run 2.1× faster (32–39 → 15–19 s).
    rows//12 500 clamped to [lo, min(cores, hi)] reproduces both
    measured optima (100 k → 8, 1 M → 32) and keeps growing with
    volume on a real cluster, where hi should be the executor-core
    count. Footer-only row count — no Spark job."""
    import os as _os

    from ..sources.registry import table_row_count

    if hi is None:
        hi = int(_os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = table_row_count(sf_dir, table) // rows_per_partition
    return str(max(lo, min(hi, n)))


def _start_parquet_sink(
    df: DataFrame, out_dir: str, checkpoint: str, mode: str = "append"
) -> StreamingQuery:
    return (
        df.writeStream.format("parquet")
        .outputMode(mode)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_file_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """I1 source: parquet file stream with native processed-file
    tracking — replaces metadata.<t>_loaded_files entirely."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(landing_dir)


def stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: StructType,
) -> StreamingQuery:
    """I1: exactly-once incremental ingestion, landing → table.

    Each AvailableNow run processes only files the checkpoint hasn't
    seen — the streaming-native form of `load_incremental` in
    sources/ingest.py (reference :154-165).
    """
    src = read_file_stream(spark, landing_dir, schema)
    return _start_parquet_sink(src, out_dir, checkpoint)


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """I2+I4 transformation: 1-hour tumbling windows per event_type,
    late rows beyond the watermark dropped deterministically."""
    from ..operators.common import dsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def stream_tumbling_counts(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: StructType,
) -> StreamingQuery:
    src = read_file_stream(spark, landing_dir, schema)
    return _start_parquet_sink(tumbling_counts(src), out_dir, checkpoint)


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """I3: gap-based session windows per user (batch twin:
    operators/timeseries.ts_sessionize)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
        )
    )


def stream_session_windows(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: StructType,
) -> StreamingQuery:
    src = read_file_stream(spark, landing_dir, schema)
    return _start_parquet_sink(session_windows(src), out_dir, checkpoint)


def stream_dedup(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: StructType,
    key: str = "event_id",
    watermark: str = "1 hour",
) -> StreamingQuery:
    """I5: stateful dedup — duplicate keys arriving within the
    watermark horizon are dropped; state is GC'd past it, so memory
    is bounded no matter how long the stream runs."""
    src = read_file_stream(spark, landing_dir, schema)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )
    return _start_parquet_sink(deduped, out_dir, checkpoint)


def events_schema() -> StructType:
    """Schema for the events fixture as the stream source expects it
    (ts already µs — see sources/registry.py nanos handling)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        TimestampType,
    )

    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def prepare_events_landing(
    spark: SparkSession, sf_dir: str, landing_dir: str, slices: int = 3
) -> None:
    """Test/demo helper: split the events fixture into N parquet files
    in a landing dir (simulating an extractor dropping batches)."""
    from ..sources import load_table

    from pyspark.sql import Window

    os.makedirs(landing_dir, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    # Slice by time-ordered row position (ntile), not id range: range
    # slicing assumed 0-based contiguous ids and silently dropped the
    # last event for 1-based ids. ntile keeps every row AND preserves
    # the in-time-order arrival a file-by-file stream replay needs —
    # the watermark advances monotonically across slices. (Global sort
    # window: test/demo helper only, never a data-plane path.)
    # Materialize the ntile ONCE (optimization r12, guide §2.4): each
    # per-slice write is a separate Spark job, and the lazy form
    # re-ran the global-sort window behind every one of them — N
    # slices paid N full sorts of the events table. persist/unpersist
    # (ADVICE r12 low): the first write materializes the sort, later
    # writes reuse the cached slices, and — unlike localCheckpoint,
    # whose blocks cannot be released through the DataFrame API — the
    # storage is reclaimed on exit, so a session calling this helper
    # many times (the test suite does ~14×) does not accumulate
    # pinned block copies for its lifetime.
    sliced = events.withColumn(
        "_slice", F.ntile(slices).over(Window.orderBy("ts", "event_id"))
    ).persist()
    try:
        for i in range(1, slices + 1):
            (
                sliced.filter(F.col("_slice") == i)
                .drop("_slice")
                .coalesce(1)
                .write.mode("append")
                .parquet(landing_dir)
            )
    finally:
        sliced.unpersist()


def interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (SURVEY §2.I extension): attribute
    each purchase to same-user clicks in the preceding `max_gap`.

    Works identically on two streaming DataFrames or two batch
    DataFrames (the batch twin used by the oracle test): watermarks on
    BOTH sides bound the join state — Spark can discard a buffered
    click once the purchase-side watermark passes click_ts + max_gap,
    so state is O(rate × gap) per key range, never unbounded.

    Equality on user_id plus a time-range predicate is the canonical
    streaming attribution join; at 100 TB/day the user_id hash
    partitioning spreads state across executors and the range
    predicate prunes buffered rows per micro-batch.
    """
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    gap = f"INTERVAL {max_gap}"
    # how="leftOuter": unattributed purchases survive with NULL click
    # columns. In streaming append mode the outer row is emitted only
    # once the click-side watermark passes the purchase's candidate
    # window (no click can still arrive) — the state-eviction point;
    # until then it is withheld, not dropped. Same column contract as
    # the inner join.
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & F.expr(f"c_ts >= p_ts - {gap}"),
        how,
    ).select("user_id", "purchase_id", "click_id", "p_ts", "c_ts")


def stream_interval_join(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint: str,
    max_gap: str = "30 minutes",
    how: str = "inner",
) -> StreamingQuery:
    """Run the attribution join with BOTH sides read as file streams
    from the same landing dir (filtered to purchases / clicks)."""
    ev = read_file_stream(spark, landing_dir, events_schema())
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = interval_join(purchases, clicks, max_gap=max_gap, how=how)
    return _start_parquet_sink(joined, out_dir, checkpoint)


# ---------------------------------------------------------------------------
# I-ext: streaming upsert (foreachBatch MERGE into a snapshot table)
# ---------------------------------------------------------------------------

def upsert_user_totals_batch(
    spark: SparkSession, table_path: str, batch: DataFrame, batch_id: int
) -> None:
    """Apply one micro-batch of events to a per-user totals table as
    an idempotent MERGE commit.

    foreachBatch delivers at-least-once: after a crash between the
    table commit and the checkpoint advance, the SAME batch_id is
    replayed. Exactly-once is restored by recording the batch id in
    the commit's properties and skipping a batch the log already
    carries — the idempotent-writer pattern Delta implements with
    `txnAppId`/`txnVersion`, re-expressed over the snapshot commit log
    (metadata scan, O(#snapshots), no data read).

    Scope of the guarantee — same as Delta's txnVersion: batch ids are
    monotone only WITHIN one checkpoint lineage. Recreating the
    checkpoint restarts ids at 0 AND makes the file source re-deliver
    every input file, so the ledger cannot (and does not try to)
    bridge that: recover a lost checkpoint by rebuilding the totals
    table from scratch, never by pointing a fresh checkpoint at the
    existing table. (The change-feed consumer `apply_cdc_batch` CAN
    survive checkpoint loss because its rows carry source offsets —
    `_commit_version` — which a file stream's rows do not.)
    """
    from ..operators.common import dsum
    from ..sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, table_path)
    if t.exists():
        # Tail-first ledger probe (r7 review — the full history()
        # walk was O(N) entry+sidecar reads per trigger): batch ids
        # are monotone within the checkpoint lineage (the guarantee's
        # documented scope), so the newest recorded id tells whether
        # this batch already landed.
        rec = t.latest_property("stream_batch_id")
        if rec is not None:
            recorded = int(rec[1])
            if recorded == batch_id:
                # The one legitimate replay: foreachBatch re-delivers
                # the batch whose commit landed but whose checkpoint
                # advance did not. Ids are allocated sequentially, so
                # a replay is always EXACTLY the recorded id.
                return
            if recorded > batch_id:
                # Ids regressed: a recreated checkpoint (restart at 0)
                # was pointed at an existing totals table. Silently
                # skipping would drop every new batch whose id
                # collides with history (r8 advice — data loss); fail
                # loudly with the documented recovery instead.
                raise ValueError(
                    f"{table_path}: incoming batch_id {batch_id} < "
                    f"recorded stream_batch_id {recorded} — the "
                    "checkpoint lineage changed. Rebuild the totals "
                    "table from scratch; never point a fresh "
                    "checkpoint at an existing table."
                )
    delta = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )
    props = {"stream_batch_id": batch_id}
    if not t.exists():
        t.create(delta, properties=props)
        return
    cur = t.read().select(
        "user_id",
        F.col("n_events").alias("cur_n"),
        F.col("total_value").alias("cur_v"),
    )
    # Absolute post-image per touched user: delta + current state.
    # Each stored double is the nearest-double of an exact cent value
    # (dsum contract), but adding two such doubles reintroduces
    # representation error (0.01 is not a binary double) — re-rounding
    # to cents recovers the nearest-double of the exact running total,
    # so the view stays bit-identical to a one-shot batch dsum in any
    # arrival order / batch split.
    combined = delta.join(cur, "user_id", "left").select(
        "user_id",
        (F.col("n_events") + F.coalesce(F.col("cur_n"), F.lit(0))).alias(
            "n_events"
        ),
        F.round(
            F.col("total_value") + F.coalesce(F.col("cur_v"), F.lit(0.0)), 2
        ).alias("total_value"),
    )
    t.merge(combined, on=["user_id"], properties=props)


def stream_upsert_user_totals(
    spark: SparkSession,
    landing_dir: str,
    table_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """I-ext: streaming materialized view — per-user event totals
    maintained by MERGE, one atomic snapshot per micro-batch. The
    touched-key set per batch is small, so each commit rewrites only
    the totals table (dimension-sized), never the event stream; at
    100 TB the event side stays append-only and this view is the
    compacted queryable state.
    """
    src = read_file_stream(
        spark, landing_dir, events_schema(), max_files_per_trigger=1
    )
    return (
        src.writeStream.foreachBatch(
            lambda batch, bid: upsert_user_totals_batch(
                spark, table_path, batch, bid
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# I-ext: stream-static enrichment join
# ---------------------------------------------------------------------------

def user_profile(events: DataFrame) -> DataFrame:
    """Static dimension for enrichment: per-user lifetime stats from
    the batch events table (cent-exact average via the dsum contract)."""
    from ..operators.common import davg

    return events.groupBy("user_id").agg(
        davg("value").alias("user_avg_value"),
        F.count(F.lit(1)).alias("user_n_events"),
    )


def enrich_events(stream_df: DataFrame, profile: DataFrame) -> DataFrame:
    """Stream-static join: tag each event with its user's historical
    profile and an above-personal-average flag. Works identically on a
    streaming or batch left side (the batch twin is the test oracle).

    The static side is a dimension (one row per user) — broadcast, so
    each micro-batch is map-only: no shuffle, no streaming state at
    all (unlike stream-stream joins, stream-static needs none). At
    100 TB/day this is the standard enrichment shape: re-broadcast the
    dim per trigger picks up slowly-changing profile updates for free.
    """
    return (
        stream_df.join(F.broadcast(profile), "user_id", "left")
        .withColumn(
            "above_avg", F.col("value") > F.col("user_avg_value")
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            "user_avg_value",
            "user_n_events",
            "above_avg",
        )
    )


def stream_enrich_events(
    spark: SparkSession,
    landing_dir: str,
    profile: DataFrame,
    out_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    src = read_file_stream(spark, landing_dir, events_schema())
    return _start_parquet_sink(enrich_events(src, profile), out_dir, checkpoint)


# ---------------------------------------------------------------------------
# I-ext: streaming IVM — the CHANGE FEED maintaining an aggregate view
# ---------------------------------------------------------------------------

def apply_cdc_batch(
    spark: SparkSession,
    view_path: str,
    keys: list[str],
    measure: str,
    batch: DataFrame,
    batch_id: int,
) -> None:
    """Fold one CDC micro-batch (rows carrying `_change_type`) into a
    keyed count/sum view as a SIGNED merge: +1/+value per insert,
    −1/−value per delete — the counting-algorithm IVM from
    `sources/ivm.py`, driven by the stream instead of a batch cursor.

    Exactly-once over foreachBatch's at-least-once replay is keyed on
    the SOURCE offset range (the batch's `_commit_version` span), NOT
    the raw foreachBatch batch_id: batch ids restart at 0 whenever
    the checkpoint is recreated — the exact recovery the change-feed
    reader's expired-snapshot error recommends — so a bare-batch_id
    ledger would silently skip real micro-batches whose ids collide
    with historical ones and the view would diverge without any
    error. Source versions are monotone and each micro-batch consumes
    a contiguous version range, so "max applied _commit_version" is a
    complete replay filter. Groups whose count reaches zero leave the
    view."""
    from ..sources.snapshot import SnapshotTable

    t = SnapshotTable(spark, view_path)
    applied_hi = -1
    if t.exists():
        # Tail-first (r7 review): each micro-batch folds a contiguous
        # monotone version span, so the NEWEST commit carrying
        # stream_src_hi holds the max — no O(#snapshots) history walk
        # per trigger.
        rec = t.latest_property("stream_src_hi")
        if rec is not None:
            applied_hi = int(rec[1])
        # A fresh-checkpoint restart replays from version 0, so one
        # micro-batch can MIX already-folded and new source versions;
        # row-filter on the offset column rather than skipping whole
        # batches, and only the genuinely-new span is folded.
        batch = batch.filter(F.col("_commit_version") > applied_hi)
    # The micro-batch is consumed by TWO actions (the span scalar and
    # the delta aggregate feeding the merge); without a persist each
    # action re-executes the change-feed scan through the Python
    # data source (optimization r12 — the documented foreachBatch
    # reuse pattern; the micro-batch is bounded by definition).
    batch = batch.persist()
    try:
        span = batch.agg(
            F.min("_commit_version").alias("lo"),
            F.max("_commit_version").alias("hi"),
        ).collect()[0]
        if span["hi"] is None:
            return  # empty / fully-replayed batch — nothing new to fold
        _apply_cdc_delta(t, keys, measure, batch, batch_id, span)
    finally:
        batch.unpersist()


def _apply_cdc_delta(t, keys, measure, batch, batch_id, span) -> None:
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    m = F.col(measure).cast("decimal(18,2)")
    delta = (
        batch.select(*keys, sign.alias("sign"), m.alias("m"))
        .groupBy(*keys)
        .agg(
            F.sum("sign").alias("cnt"),
            F.sum(F.col("sign") * F.col("m"))
            .cast("decimal(18,2)")
            .alias("total"),
        )
    )
    props = {
        "stream_batch_id": batch_id,
        "stream_src_lo": int(span["lo"]),
        "stream_src_hi": int(span["hi"]),
    }
    if not t.exists():
        t.create(delta.filter(F.col("cnt") != 0), properties=props)
        return
    cur = t.read().select(
        *keys, F.col("cnt").alias("cnt_a"), F.col("total").alias("tot_a")
    )
    d = delta.select(
        *keys, F.col("cnt").alias("cnt_b"), F.col("total").alias("tot_b")
    )
    merged = (
        cur.join(d, keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce("cnt_a", F.lit(0)) + F.coalesce("cnt_b", F.lit(0))
            ).alias("cnt"),
            (
                F.coalesce(F.col("tot_a"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("tot_b"), F.lit(0).cast("decimal(18,2)"))
            ).cast("decimal(18,2)").alias("total"),
        )
        .filter(F.col("cnt") != 0)
    )
    t.create_or_replace(merged, properties=props)


def stream_cdc_aggregate(
    spark: SparkSession,
    src_table_path: str,
    view_path: str,
    keys: list[str],
    measure: str,
    checkpoint: str,
) -> StreamingQuery:
    """Streaming materialized view over a MUTATING table: consume the
    snapshot table's row-level change feed
    (`format("snapshot").option("readChangeFeed", "true")`) and fold
    each micro-batch into the aggregate with a signed merge. Appends
    AND row-level MoR deletes flow through; the view table is
    dimension-sized, the source stays untouched. This is the
    composition Delta sells as CDF → foreachBatch MERGE, closed
    end-to-end over the commit-log format.

    At 100 TB: per-trigger work = O(changed rows) + O(view); the
    stream's offsets are snapshot versions in the checkpoint, so
    restarts resume exactly-once mid-history."""
    from ..sources.pyds import SnapshotDataSource

    spark.dataSource.register(SnapshotDataSource)
    src = (
        spark.readStream.format("snapshot")
        .option("readChangeFeed", "true")
        .load(src_table_path)
    )
    return (
        src.writeStream.foreachBatch(
            lambda batch, bid: apply_cdc_batch(
                spark, view_path, keys, measure, batch, bid
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
