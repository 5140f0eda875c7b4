"""Streaming source abstractions beyond the file source (SURVEY §2.10).

Three tiers, mirroring how a production deployment would feed the engine:

- **File stream** (`events.read_event_stream`) — the fixture-backed source;
  at scale, a landing directory of arriving parquet/json files.
- **Rate stream** (:func:`read_rate_stream`) — Spark's built-in synthetic
  source shaped into the events schema: a deterministic-schema load
  generator for soak/throughput tests with no external dependency.
- **Kafka-shaped** (:func:`decode_kafka_events`, :func:`read_kafka_stream`)
  — the broker source. No Kafka client or broker exists in this
  environment, so `read_kafka_stream` is an import/connection-gated thin
  wrapper; the VALUE of this module is `decode_kafka_events`, the
  pure-DataFrame normalizer from Kafka's wire schema (key/value binary,
  topic/partition/offset) to the typed events table. It runs identically
  on a real Kafka stream and on any batch frame with the same shape —
  which is how it's tested here.

At 100 TB/day the Kafka path is the real ingestion story: partitions map to
Spark tasks 1:1, offsets give exactly-once with checkpointing, and the
decode is a map-only stage (JSON parse inside codegen, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune

# Kafka's fixed wire schema (what spark-sql-kafka emits).
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

# JSON payload schema carried in `value` for the events topic.
EVENT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def decode_kafka_events(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire frame → typed events frame.

    Map-only: cast value bytes to string, `from_json` with an explicit
    schema (malformed payloads → null struct → dropped, never a crash),
    keep the broker metadata that matters for lineage/dedup (topic,
    partition, offset) and use the broker timestamp as the event time.
    Works on streams and batch frames alike — the decode carries no state.
    """
    parsed = kafka_df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("ts"),
        F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA).alias("ev"),
    )
    # PERMISSIVE from_json yields an all-null struct (not a null struct)
    # for malformed payloads — gate on the required id field.
    return parsed.filter(
        F.col("ev").isNotNull() & F.col("ev.event_id").isNotNull()
    ).select(
        F.col("ev.event_id").alias("event_id"),
        F.col("ev.user_id").alias("user_id"),
        F.col("ev.event_type").alias("event_type"),
        F.col("ev.value").alias("value"),
        "ts",
        "topic",
        "partition",
        "offset",
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Broker-backed stream → decoded events. Gated: the spark-sql-kafka
    connector jar and a reachable broker are required (neither exists in
    this environment); the decode path is the tested part."""
    tune(spark)
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # connector jar absent → clean gate
        raise NotImplementedError(
            "spark-sql-kafka connector is not available in this environment; "
            "feed decode_kafka_events a Kafka-shaped frame instead"
        ) from e
    return decode_kafka_events(raw)


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, n_event_types: int = 4
) -> DataFrame:
    """Synthetic event stream from Spark's built-in rate source, shaped to
    the events schema: deterministic columns derived from the rate value
    (the timestamps advance with the wall clock — that's the point of a
    load generator). Use for soak tests and sink-throughput measurements
    without any external system."""
    tune(spark)
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )  # columns: timestamp, value (monotonically increasing long)
    return raw.select(
        F.col("value").alias("event_id"),
        F.pmod(F.col("value"), F.lit(1000)).alias("user_id"),
        F.concat(
            F.lit("type_"), F.pmod(F.col("value"), F.lit(n_event_types)).cast("string")
        ).alias("event_type"),
        (F.pmod(F.col("value"), F.lit(100)) / F.lit(10.0)).alias("value"),
        F.col("timestamp").alias("ts"),
    )
