"""Event/time-series queries over the ``events`` stream-shaped table.

The reference has no streaming subsystem (SURVEY.md §2.C) — these are the
batch equivalents of the streaming operators exposed in
``dataclod_spark.streaming``: tumbling-window aggregation (≈ ``F.window`` +
watermark in the streaming path), sessionization (≈ session windows /
``applyInPandasWithState``), and JSON payload extraction.  Each batch form is
SQL-expressible, so all three carry DuckDB oracles.

Scale notes: sessionization is a single shuffle on ``user_id`` (the window
partition key) — at 100 TB the same plan holds because state is per-user and
Spark's window exec spills; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dataclod_spark.registry import load, query


@query(
    "e1_sessionization",
    bench=True,
    doc="30-min-gap sessionization via lag + cumulative flag sum",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM sessions
GROUP BY user_id
ORDER BY user_id
""",
)
def e1_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # NOTE: the oracle orders the cumulative sum by event_id; ts order and
    # event_id order coincide per user in this data, and using event_id for
    # the running sum makes the frame deterministic on both engines.
    w_cum = W.partitionBy("user_id").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "e2_tumbling_window",
    doc="tumbling 1-hour window aggregation (batch form of streaming F.window)",
    oracle="""
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
)
def e2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "e3_json_extract",
    doc="JSON payload extraction + grouped aggregate (get_json_object)",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value), 4) AS avg_value
FROM events
GROUP BY k_mod
ORDER BY k_mod
""",
)
def e3_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("k_mod", F.get_json_object("props", "$.k").cast("int") % 10)
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("value"), 4
            ).alias("avg_value"),
        )
        .orderBy("k_mod")
    )
