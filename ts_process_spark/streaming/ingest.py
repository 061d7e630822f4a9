"""Structured Streaming raw→1m ingest (the optional streaming front of
the cascade; SURVEY §2.9 — the reference is batch-only, so this surface
is engine-native with no reference semantics to match).

Shape: file-source stream of transcript turns → 10-minute watermark →
tumbling 1-minute window per conv_id → append-mode aggregates.  The
streaming tier carries the JVM-side aggregate columns only (counts,
sums, peaks); blob encoding and gap-fill need a conversation's
neighborhood and therefore stay in the batch cascade, which
periodically compacts the streaming tier (the classic lambda handoff —
idempotent because both paths write the same keys).

Late data: rows later than the watermark are dropped by the stream and
healed by the next batch backfill over the same partition — the batch
cascade is the source of truth; streaming is a freshness cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ts_process_spark.datagen import TRANSCRIPT_SCHEMA


def stream_raw(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def stream_rollup_1m(raw: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Windowed streaming aggregate; append output mode (finalized
    windows only)."""
    return (
        raw.where(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.max(F.length("text")).alias("peak_text_len"),
            F.min("turn_idx").alias("first_turn_idx"),
            F.max("turn_idx").alias("last_turn_idx"),
        )
        .select(
            "conv_id",
            F.col("win.start").alias("bucket_ts"),
            "n_turns",
            "sum_text_len",
            "peak_text_len",
            "first_turn_idx",
            "last_turn_idx",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, path: str, query_name: str = "tier_1m_stream"
) -> DataFrame:
    """Drive the stream to completion over a static directory (test/demo
    harness): memory sink + processAllAvailable."""
    q = (
        stream_rollup_1m(stream_raw(spark, path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
