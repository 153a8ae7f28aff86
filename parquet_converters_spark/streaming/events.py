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
        src = src.withWatermark("ts", watermark)
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
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )


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
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
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
        src = events.withWatermark("ts", watermark or "1 hour")
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
    new_session = F.when(
        gap.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(gap) > gap_minutes * 60),
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
