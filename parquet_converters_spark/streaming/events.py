"""Structured Streaming pipelines over the ``events`` table.

The reference has no streaming surface (SURVEY §2, "operators the
reference does NOT have"); these are the extended-engine stream
operators, written so the *same* transformation runs in batch (for the
DuckDB oracle) and as a ``readStream`` with watermarks (for late data).
That symmetry is the point: Structured Streaming treats a stream as an
unbounded DataFrame, so one function body serves both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def as_instant(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize event-time columns to TIMESTAMP (instant) type.

    Naive parquet timestamps (isAdjustedToUTC=false) read as
    TIMESTAMP_NTZ in Spark 4, and ``withWatermark`` requires an instant
    type.  The session timezone is pinned to UTC (session.py /
    queries._t), so the cast is value-stable: wall-clock == epoch
    interpretation, matching the oracle's naive-timestamp arithmetic.
    Batch plans keep NTZ untouched — only the watermarked streaming
    path needs instants.
    """
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window per-type aggregation (count + value sum/avg).

    With ``watermark`` set (streaming input), late events beyond the
    bound are dropped and windows finalize incrementally; in batch the
    same plan computes the full history.  Output columns are flattened
    so the batch result is directly oracle-comparable
    (``time_bucket`` in DuckDB).
    """
    src = events
    if watermark:
        src = as_instant(src, "ts").withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def read_events_stream(
    spark: SparkSession,
    events_path: str,
    schema=None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over an events parquet directory (the local
    stand-in for Kafka/Kinesis: same downstream plan, different source)."""
    if schema is None:
        schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )
    # streaming consumers watermark on event time — hand them instants
    return as_instant(stream, "ts")


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count
    and value sum, maintained across triggers with
    ``applyInPandasWithState`` (Arrow-batched, one state row per user).

    On a stream, each trigger emits the *updated* totals for users seen
    in that batch (output mode ``update``); state lives in the state
    store and survives restarts via checkpointing.  At 100 TB/day the
    state is O(distinct users) — keyed, partitioned by the shuffle on
    ``user_id``, nothing driver-side.

    On a batch DataFrame (where Spark forbids the stateful form) the
    same accumulation runs as a stateless ``applyInPandas`` — one
    "trigger" containing all the data — which is how the unit test and
    the DuckDB oracle cross-check it.
    """
    out_schema = "user_id long, n_events long, value_sum double"

    def accumulate(n, s, pdf_iter):
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        return n, s

    def emit(user_id, n, s):
        import pandas as pd

        return pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "value_sum": [round(s, 6)]}
        )

    grouped = events.select("user_id", "value").groupBy("user_id")

    if not events.isStreaming:
        def batch_fn(key, pdf):
            n, s = accumulate(0, 0.0, [pdf])
            return emit(key[0], n, s)

        return grouped.applyInPandas(batch_fn, schema=out_schema)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = "n long, s double"

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        n, s = accumulate(n, s, pdf_iter)
        state.update((n, s))
        yield emit(key[0], n, s)

    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def view_purchase_join(
    views: DataFrame,
    purchases: DataFrame,
    band_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream inner join: purchases matched to same-user views
    they followed within ``band_minutes``.

    Streaming (both inputs ``readStream``): watermarks on both sides +
    the time-bound join condition let Spark expire join state — without
    the bound the view-side buffer grows forever.  State is O(events
    inside the band per user), partitioned by the equi-key.

    Batch: identical plan minus state (``withWatermark`` is a no-op),
    which is what the DuckDB oracle checks.
    """
    v = as_instant(views, "ts").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = as_instant(purchases, "ts").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    if watermark:
        v = v.withWatermark("v_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"interval {band_minutes} minutes")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )


def dedup_events(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Exactly-once by event_id: streaming uses
    ``dropDuplicatesWithinWatermark`` (state expires once the watermark
    passes an id's event time — bounded memory, unlike plain
    ``dropDuplicates`` on a stream); batch uses plain ``dropDuplicates``.
    """
    if events.isStreaming:
        src = as_instant(events, "ts").withWatermark("ts", watermark or "1 hour")
        return src.dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: per-user sessions split at inactivity gaps
    (gaps-and-islands with a lag window — the same run-length pattern as
    the adjacency index builder, applied to time).

    Streaming equivalent: ``groupBy(session_window("ts", gap))`` — kept
    separate because the oracle needs the deterministic batch form.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    # Compare at microsecond precision: unix_timestamp() truncates to
    # whole seconds, which silently mis-splits sessions whose gap
    # straddles the boundary sub-second (e.g. 1799.9 s vs 1800.1 s).
    new_session = F.when(
        gap.isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(gap)
            > gap_minutes * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    return (
        events.withColumn("_new", new_session)
        .withColumn(
            "session_id",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessions emitted ON CLOSE via event-time timer — the stateful
    pattern ``session_window`` cannot express (it re-emits aggregates;
    this emits a session exactly once, when its inactivity gap elapses
    past the watermark).

    Streaming path: ``applyInPandasWithState`` with
    ``EventTimeTimeout`` — per-user state is (start, last, n, sum);
    in-batch gaps close sessions immediately, the trailing open session
    arms ``setTimeoutTimestamp(last + gap)`` and is flushed by the
    timer once the watermark passes it.  State is O(active users),
    keyed and partitioned by the groupBy shuffle.

    Batch path (same function, same output contract): gaps-and-islands
    in microseconds.  Every closed streaming session must byte-match a
    batch session — asserted in tests.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, value_sum double"
    )

    events = as_instant(events, "ts")
    if not events.isStreaming:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap_prev = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        new_s = F.when(gap_prev.isNull() | (gap_prev > gap_us), 1).otherwise(0)
        return (
            events.withColumn("_new", new_s)
            .withColumn(
                "_sid",
                F.sum("_new").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("user_id", "_sid")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("value_sum"),
            )
            .select(
                "user_id", "session_start", "session_end", "n_events", "value_sum"
            )
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = "start_us long, last_us long, n long, s double"

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        uid = key[0]

        def emit_row(start_us, last_us, n, s):
            return pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [round(s, 6)],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, s = state.get
            state.remove()
            yield emit_row(start_us, last_us, n, s)
            return

        rows = [pdf[["ts", "value"]] for pdf in pdf_iter if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values("ts")
        ts_us = (batch["ts"].astype("int64") // 1000).to_list()
        vals = batch["value"].to_list()

        start_us = None
        if state.exists:
            start_us, last_us, n, s = state.get
        # rows already behind the watermark are dropped (standard
        # lateness contract — flatMapGroupsWithState does not filter
        # them for us the way windowed aggregations do)
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = []
        for t, v in zip(ts_us, vals):
            if t <= wm_us:
                continue
            if start_us is None:
                start_us, last_us, n, s = t, t, 1, float(v)
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n, s))
                start_us, last_us, n, s = t, t, 1, float(v)
            else:
                # cross-trigger disorder within the lateness bound: an
                # older event extends membership but must never move
                # the session end backwards
                last_us, n, s = max(last_us, t), n + 1, s + float(v)
        if start_us is None:
            return  # every row was late
        state.update((start_us, last_us, n, s))
        # arm the event-time timer: fire once the watermark passes the
        # open session's gap deadline (ms epoch per the state API).
        # Data can arrive with event times already behind the watermark
        # (out-of-order files within the lateness bound) — a deadline in
        # the past is clamped to watermark+1 so the session flushes at
        # the next trigger instead of crashing the query.
        deadline_ms = last_us // 1000 + gap_minutes * 60 * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        for sess in closed:
            yield emit_row(*sess)

    return (
        as_instant(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    dim_key: str,
    n_buckets: int,
) -> DataFrame:
    """Stream-static enrichment: join each event to a static dimension
    row on ``user_id % n_buckets``.

    In Structured Streaming a stream-static equi-join is *stateless* —
    the static side is (re)broadcast per micro-batch and no watermark
    is needed; the same body runs in batch for the oracle.  This is
    the canonical "enrich the firehose with reference data" operator.
    """
    return events.withColumn(
        "_dim_key", (F.col("user_id") % n_buckets).cast(dict(dim.dtypes)[dim_key])
    ).join(F.broadcast(dim), F.col("_dim_key") == F.col(dim_key)).drop("_dim_key")
