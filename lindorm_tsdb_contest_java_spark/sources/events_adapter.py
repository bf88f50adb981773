"""Adapter: the driver's `events` table → the transcripts data model.

The correctness driver compares our Spark queries against DuckDB SQL over
the same parquet tables, so the transcript-shaped input used for those
checks must be *derivable identically in both engines*. This module
defines that derivation once for Spark and once as a SQL CTE prefix for
DuckDB:

    conv_id  = cast(user_id as string)
    turn_idx = row_number() over (partition by user_id order by ts, event_id) - 1
    role     = event_type
    text     = props
    tool     = deterministic low-cardinality mapping of event_type
    ts       = ts            (unique per user in the test data)

plus the canonical derived metrics (ts_us, text_len, latency_s) from
FIXTURES.md §2. The synthetic generator (sources/generator.py) remains
the fixture for pytest/bench; this adapter exists for the cross-engine
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def ensure_utc(spark: SparkSession) -> None:
    """The NTZ->timestamp cast under unix_micros is tz-sensitive; the
    oracle (duckdb epoch_us on naive timestamps) is effectively UTC. The
    driver may hand us a session with any timezone, so pin it here —
    session timeZone is a runtime conf, safe to set at any point."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_to_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "error", F.lit("bash"))
         .when(F.col("event_type") == "purchase", F.lit("pay"))
         .otherwise(F.lit("")).alias("tool"),
        F.col("ts"),
    )


def events_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcripts + ts_us/text_len/latency_s, matching CANONICAL_CTE."""
    t = events_to_transcripts(spark, sf_dir)
    lag_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        # parquet timestamps read as TIMESTAMP_NTZ in Spark 4; the session is
        # pinned to UTC so the NTZ->TZ cast is the identity duckdb's epoch_us uses
        t.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("text_len", F.length("text").cast("long"))
        # latency carried as exact integer micros: sums of latency_us are
        # bit-identical across engines (int64), so derived averages are
        # deterministic doubles — no rounding-boundary flakiness
        .withColumn(
            "latency_us",
            F.coalesce(F.col("ts_us") - F.lag("ts_us").over(lag_w), F.lit(0)).cast("long"),
        )
        .withColumn("latency_s", F.col("latency_us") / F.lit(1e6))
    )


# DuckDB CTE prefix — every oracle query starts with this.
CANONICAL_CTE = """
WITH transcripts AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         event_type AS role,
         props AS text,
         CASE WHEN event_type = 'error' THEN 'bash'
              WHEN event_type = 'purchase' THEN 'pay'
              ELSE '' END AS tool,
         ts
  FROM events
),
canonical AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, ts_us,
         CAST(length(text) AS BIGINT) AS text_len,
         latency_us,
         latency_us / 1e6 AS latency_s
  FROM (
    SELECT *, epoch_us(ts) AS ts_us,
           CAST(COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0) AS BIGINT) AS latency_us
    FROM transcripts
  )
)
"""

# time constants for the driver queries (events span 2024-01-01 .. 2024-01-31 UTC)
JAN1_MS = 1_704_067_200_000
JAN8_MS = JAN1_MS + 7 * 86_400_000
JAN31_MS = JAN1_MS + 30 * 86_400_000
