"""Event-stream batch operators (sessionization, windowed aggregation).

The reference has no streaming/event notion (SURVEY §2.9); these are the
batch equivalents the engine adds for the events table, built on window
functions only — the streaming variants live in
:mod:`xcube_stac_spark.streaming`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Classic lag+cumsum sessionization: a new session starts when the gap
    to the previous event of the same user exceeds ``gap_sec``. One shuffle
    on user_id; at scale the events table is already partitioned by
    user-hash so the window is partition-local."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(ts_us.asc(), F.col("event_id").asc())
    df = (
        events.withColumn("ts_us", ts_us)
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            # a gap of EXACTLY gap_sec starts a new session (>=): the same
            # convention as Spark's session_window, whose per-event window
            # [ts, ts+gap) merges only with events strictly inside it
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | ((F.col("ts_us") - F.col("prev_us")) >= gap_sec * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return df.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.min("ts_us") / 1_000_000).cast("long").alias("t_start_sec"),
        (F.max("ts_us") / 1_000_000).cast("long").alias("t_end_sec"),
        F.round(F.sum("value"), 3).alias("total_value"),
    )


def tumbling_window_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling time-window aggregation per event type (batch twin of the
    structured-streaming windowed agg)."""
    bucket = (
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / (minutes * 60 * 1_000_000))
    ).alias("window_id")
    return (
        events.groupBy(bucket, "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )
