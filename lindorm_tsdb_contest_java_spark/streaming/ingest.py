"""Structured Streaming ingest: continuous tier maintenance.

The reference engine is synchronous-batch; its closest streaming analog
is the 250-row memtable micro-batch flush (memory/MemoryTable.java:67-70).
Here the same tier maintenance runs as a Structured Streaming job over a
file source (drop a parquet file into the landing dir = a write batch):

- watermark on ts bounds state for late turns (the reference instead
  accepts out-of-order writes into whichever block is open);
- the windowed aggregate emits exactly the conv-tier measures, so the
  streaming tier equals the batch tier for closed windows — verified by
  the equivalence test;
- Trigger.AvailableNow gives the batch-resume semantics (process what's
  there, checkpoint, stop), matching the snapshot-checkpoint story of
  the batch pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.segments import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    return (spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(landing_dir))


def streaming_conv_tier(stream: DataFrame, width_s: int = 60,
                        watermark: str = "10 minutes") -> DataFrame:
    """Per-(conv_id, window) decomposable measures, watermarked."""
    return (
        stream
        .withColumn("text_len", F.length("text").cast("long"))
        .withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", f"{width_s} seconds").alias("win"))
        .agg(F.count("*").alias("n_turns"),
             F.sum("text_len").alias("text_len_sum"),
             F.min("text_len").alias("text_len_min"),
             F.max("text_len").alias("text_len_max"))
        .select("conv_id",
                (F.unix_micros(F.col("win.start").cast("timestamp")) / 1000)
                .cast("long").alias("bucket_ms"),
                "n_turns", "text_len_sum", "text_len_min", "text_len_max")
    )


def run_available_now(tier: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Process all pending files, commit the checkpoint, stop — resumable."""
    q = (tier.writeStream.outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", checkpoint_dir)
         .start(out_dir))
    q.awaitTermination()
