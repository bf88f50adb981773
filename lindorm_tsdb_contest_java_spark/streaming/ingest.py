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


def read_transcript_stream(spark: SparkSession, landing_dir: str,
                           max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
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


def streaming_latest(stream: DataFrame) -> DataFrame:
    """Per-conversation latest row maintained as STREAMING STATE — the
    applyInPandasWithState analog of the materialized latest tier (and of
    the reference's in-memory MapIndex.getLast, index/MapIndex.java:99-114,
    which it keeps current on every write). Each micro-batch emits the
    conversations whose latest row changed; state holds one row per conv.
    The per-group reducer is vectorized pandas (argmax over the batch,
    one comparison against state)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts_us long")
    state_schema = ("turn_idx int, role string, text string, tool string, "
                    "ts_us long")

    def update(key, pdfs, state: GroupState):
        best = None  # (ts_us, turn_idx, role, text, tool)
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
            import numpy as np
            i = int(np.lexsort((pdf["turn_idx"].to_numpy(), ts_us))[-1])
            cand = (int(ts_us[i]), int(pdf["turn_idx"].iloc[i]),
                    str(pdf["role"].iloc[i]), str(pdf["text"].iloc[i]),
                    str(pdf["tool"].iloc[i]))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if best is None:
            return
        if state.exists:
            turn_idx, role, text, tool, ts_us_old = state.get
            if (ts_us_old, turn_idx) >= (best[0], best[1]):
                return  # nothing newer this batch: emit nothing
        state.update((best[1], best[2], best[3], best[4], best[0]))
        yield pd.DataFrame([{
            "conv_id": key[0], "turn_idx": best[1], "role": best[2],
            "text": best[3], "tool": best[4], "ts_us": best[0],
        }])

    return stream.groupBy("conv_id").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def run_available_now(tier: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Process all pending files, commit the checkpoint, stop — resumable."""
    q = (tier.writeStream.outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", checkpoint_dir)
         .start(out_dir))
    q.awaitTermination()


def stream_into_store(spark: SparkSession, landing_dir: str, root: str,
                      checkpoint_dir: str, n_buckets: int | None = None,
                      chunk_us: int | None = None,
                      cascade_every: int = 4,
                      max_files_per_trigger: int = 4,
                      l0_append: bool = False,
                      compact_at_end: bool = True,
                      compact_every: int | None = None):
    """Continuous ingestion INTO THE ENGINE'S COMPRESSED STORE: each
    micro-batch is an engine write + memtable-cost flush, so a stream of
    landing files becomes encoded segments + maintained tiers with
    per-batch cost O(batch), independent of table history (the fast
    flush path; engine.shutdown). The reference's closest analog is its
    250-row memtable flush loop (memory/MemoryTable.java:67-70) running
    forever.

    `cascade_every` amortizes the flush floor (r03 verdict ask #6): the
    1h/1d coarse rebuild — a fixed four-job tail per flush — runs only
    every Nth batch, the rest defer it through the checkpoint's
    crash-safe cascade_pending set, and a final catch-up at stream end
    guarantees the coarse tiers are current when the call returns.
    Deferral never affects 1m-tier/segment-served queries (every engine
    query path); only coarse 1h/1d reads would lag mid-stream.

    `compact_every` (with l0_append) bounds the delta store on long
    streams: every Nth batch folds l0 into the base layout. A compaction
    is the ordinary O(changed chunks) rewrite — the LSM merge trade —
    so pick N to amortize it against the O(batch) appends between.

    Restart safety is double-layered: the streaming checkpoint replays
    any batch whose flush didn't complete, and the pipeline's content
    fingerprints make the replayed flush a no-op for already-committed
    chunks — effective exactly-once into the store (a crash between a
    deferred flush and its catch-up re-cascades from cascade_pending on
    the next flush). Returns the engine (caller queries it directly)."""
    from ..engine import TranscriptTSDB

    # Two write-amplification knobs for the default (rewrite) flush:
    # chunk_us bounds how much a touched-chunk rewrite re-encodes (15 min
    # chunks = 24x less than the 6h default), and l0_append switches the
    # flush to the O(batch) delta-segment path entirely — eligible
    # batches APPEND encoded segments (engine._append_flush) and the
    # stream-end compaction folds them into the base layout. Params left
    # at None adopt the store's stamped values (store_config.json).
    eng = TranscriptTSDB(spark, root, n_buckets=n_buckets, chunk_us=chunk_us,
                         l0_append=l0_append)
    seen = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # the flush reads the streaming frame exactly once (the durable
        # raw append); every later job reads the appended parquet back,
        # so no multi-pass-over-streaming-frame hazard
        seen["n"] += 1
        eng.write(batch_df)
        eng.shutdown(cascade=(cascade_every <= 1
                              or seen["n"] % cascade_every == 0))
        # periodic L0 compaction bounds the delta store on unbounded
        # streams (read fan-in and the replay anti-join both grow with
        # l0): fold every Nth batch, not just at stream end
        if (l0_append and compact_every
                and seen["n"] % compact_every == 0):
            eng.compact()

    q = (read_transcript_stream(spark, landing_dir, max_files_per_trigger)
         .writeStream.foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", checkpoint_dir)
         .start())
    q.awaitTermination()
    eng.run_cascade()  # catch-up: coarse tiers current at return
    if l0_append and compact_at_end:
        eng.compact()  # fold delta segments into the base chunk layout
    return eng
