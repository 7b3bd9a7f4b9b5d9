"""Event-time windowed aggregation with watermarks — the Structured
Streaming late-data story over the crawl's event stream.

The crawl itself needs no event-time semantics (crawl ORDER is the
contract, SURVEY.md §2.6); this module covers the pipeline-monitoring
side: fetch/response events aggregated into tumbling windows with a
watermark bounding both state size and late-data admission. A row arriving
later than `lateness` behind the stream's max event time is dropped by the
watermark; windows finalize (and emit, in append mode) once the watermark
passes their end — exactly Spark's documented semantics, pinned by
tests/test_streaming.py.

Scale posture: state per (window, event_type) key only — the watermark
evicts finalized windows, so state is O(active windows × types), not
O(events). The same plan runs on a 1000-executor cluster unchanged
(state store is per-partition, keyed shuffle on the group keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "ts timestamp, event_type string, value double"


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    window_len: str = "1 hour",
    lateness: str = "30 minutes",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream(json events) → watermark → tumbling-window counts.

    Returns the streaming DataFrame; pair with `run_windowed_to_parquet`
    (append mode: a window row is emitted exactly once, when the watermark
    finalizes it) or any sink the caller owns.
    """
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_EVENT_SCHEMA = "ts timestamp, user_id long, value double"


def session_window_counts(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    lateness: str = "30 minutes",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming sessionization via the engine's native session_window: a
    session closes when no event arrives for `gap`, and (append mode) is
    emitted exactly once, when the watermark passes its end. The streaming
    complement of operators/sessions.sessionize — same gap semantics, but
    over an unbounded stream with watermark-bounded state.

    Scale posture: state is per (user, open session); the watermark evicts
    closed sessions, so state is O(concurrently-active sessions), not
    O(events). The shuffle keys on user_id — identical placement to the
    batch sessionizer."""
    events = (
        spark.readStream.schema(SESSION_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_windowed_to_parquet(
    agg: DataFrame, output_dir: str, checkpoint_dir: str
):
    """Append-mode parquet sink: rows appear only for FINALIZED windows
    (watermark passed window end) — the exactly-once window emission."""
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
