"""Streaming tier == batch tier for closed windows; resumable ingest."""

import os

import pytest
from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark.sources.generator import (
    generate_transcripts, write_transcripts_parquet,
)
from lindorm_tsdb_contest_java_spark.streaming.ingest import (
    read_transcript_stream, run_available_now, streaming_conv_tier,
)


@pytest.fixture(scope="module")
def small_pdf():
    return generate_transcripts(n_conv=40, mean_turns=25, seed=7)


def test_streaming_tier_equals_batch(spark, small_pdf, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # two "write batches" landing separately
    half = len(small_pdf) // 2
    write_transcripts_parquet(small_pdf.iloc[:half], f"{landing}/batch1.parquet")
    write_transcripts_parquet(small_pdf.iloc[half:], f"{landing}/batch2.parquet")

    out = str(tmp_path / "tier_stream")
    ckpt = str(tmp_path / "ckpt")
    tier = streaming_conv_tier(read_transcript_stream(spark, landing), width_s=60)
    run_available_now(tier, out, ckpt)

    got = (spark.read.parquet(out)
           .groupBy("conv_id", "bucket_ms")  # merge partial emits across batches
           .agg(F.sum("n_turns").alias("n_turns"),
                F.sum("text_len_sum").alias("text_len_sum"),
                F.min("text_len_min").alias("text_len_min"),
                F.max("text_len_max").alias("text_len_max"))
           .toPandas().sort_values(["conv_id", "bucket_ms"]).reset_index(drop=True))

    batch_df = spark.createDataFrame(small_pdf)
    expect = (batch_df
              .withColumn("text_len", F.length("text").cast("long"))
              .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
              .groupBy("conv_id",
                       ((F.floor(F.col("ts_us") / F.lit(60_000_000))) * F.lit(60_000))
                       .alias("bucket_ms"))
              .agg(F.count("*").alias("n_turns"),
                   F.sum("text_len").alias("text_len_sum"),
                   F.min("text_len").alias("text_len_min"),
                   F.max("text_len").alias("text_len_max"))
              .toPandas().sort_values(["conv_id", "bucket_ms"]).reset_index(drop=True))

    # append mode emits a window only once the watermark passes it; windows
    # within the watermark horizon of the stream's max ts stay open and
    # unemitted at availableNow termination — exact equality on the rest
    max_ts_us = int(small_pdf["ts"].astype("int64").max() // 1000)
    horizon_ms = max_ts_us // 1000 - 10 * 60 * 1000 - 60_000
    closed = expect[expect["bucket_ms"] <= horizon_ms].reset_index(drop=True)
    merged = got.merge(expect, on=list(got.columns), how="inner")
    assert len(merged) == len(got), "every emitted window must match batch exactly"
    assert len(got) >= len(closed), "all watermark-closed windows must be emitted"


def test_streaming_resume_processes_only_new_files(spark, small_pdf, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # split by event time (not position): data older than the advanced
    # watermark would be dropped as late, which is correct but not what
    # this resume test exercises
    by_ts = small_pdf.sort_values("ts").reset_index(drop=True)
    write_transcripts_parquet(by_ts.iloc[:500], f"{landing}/b1.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    tier = streaming_conv_tier(read_transcript_stream(spark, landing), width_s=60)
    run_available_now(tier, out, ckpt)
    n1 = spark.read.parquet(out).agg(F.sum("n_turns")).collect()[0][0] or 0
    assert n1 <= 500  # open windows may be withheld by the watermark

    # resume with a new file: only the delta is processed, counts advance,
    # and append mode never re-emits a window
    write_transcripts_parquet(by_ts.iloc[500:700], f"{landing}/b2.parquet")
    tier2 = streaming_conv_tier(read_transcript_stream(spark, landing), width_s=60)
    run_available_now(tier2, out, ckpt)
    final = spark.read.parquet(out)
    n2 = final.agg(F.sum("n_turns")).collect()[0][0]
    assert n1 < n2 <= 700
    dup_windows = (final.groupBy("conv_id", "bucket_ms").count()
                   .filter("count > 1").count())
    assert dup_windows == 0


def test_streaming_latest_stateful_equals_batch(spark, small_pdf, tmp_path):
    """applyInPandasWithState latest: after both batches drain, the last
    update emitted per conversation equals the batch latest-per-conv."""
    from lindorm_tsdb_contest_java_spark.streaming.ingest import streaming_latest

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    by_ts = small_pdf.sort_values("ts").reset_index(drop=True)
    half = len(by_ts) // 2
    write_transcripts_parquet(by_ts.iloc[:half], f"{landing}/b1.parquet")
    write_transcripts_parquet(by_ts.iloc[half:], f"{landing}/b2.parquet")

    out = streaming_latest(read_transcript_stream(spark, landing))
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("latest_updates")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    ups = spark.sql("SELECT * FROM latest_updates").toPandas()
    # final state per conv = the update with max (ts_us, turn_idx)
    final = (ups.sort_values(["conv_id", "ts_us", "turn_idx"])
             .groupby("conv_id").tail(1).set_index("conv_id"))

    exp = (spark.createDataFrame(by_ts)
           .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
           .groupBy("conv_id")
           .agg(F.max_by(F.struct("turn_idx", "text", "ts_us"),
                         F.struct("ts_us", "turn_idx")).alias("r"))
           .select("conv_id", "r.turn_idx", "r.text", "r.ts_us")
           .toPandas().set_index("conv_id"))
    assert len(final) == len(exp)
    for conv, row in exp.iterrows():
        assert final.loc[conv, "ts_us"] == row["ts_us"], conv
        assert final.loc[conv, "turn_idx"] == row["turn_idx"], conv
        assert final.loc[conv, "text"] == row["text"], conv


def test_stream_into_store_equals_batch_engine(spark, tmp_path):
    """Landing files -> compressed store via foreachBatch micro-flushes:
    answers equal a batch engine fed the same data in one write, a
    re-run with a new landing file processes ONLY that file (streaming
    checkpoint) through the fast flush path, and the store stays the
    only storage (raw log retired per batch)."""
    from lindorm_tsdb_contest_java_spark import engine as EM
    from lindorm_tsdb_contest_java_spark.streaming.ingest import stream_into_store

    pdf = generate_transcripts(n_conv=40, mean_turns=25, seed=7)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    third = len(pdf) // 3
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    write_transcripts_parquet(pdf.iloc[:third], f"{landing}/b1.parquet")
    write_transcripts_parquet(pdf.iloc[third:2 * third], f"{landing}/b2.parquet")

    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt2")
    eng = stream_into_store(spark, landing, root, ckpt, n_buckets=8)
    assert eng._raw.current().files == []  # log retired after each flush

    # resume: one more landing file, only it is processed
    write_transcripts_parquet(pdf.iloc[2 * third:], f"{landing}/b3.parquet")
    eng = stream_into_store(spark, landing, root, ckpt, n_buckets=8)

    batch_eng = EM.connect(spark, str(tmp_path / "batch"), n_buckets=8)
    batch_eng.write(spark.createDataFrame(pdf))
    batch_eng.shutdown()

    assert sorted(map(str, eng.execute_latest_query().collect())) == \
        sorted(map(str, batch_eng.execute_latest_query().collect()))
    got = sorted(map(str, eng._decoded_input().collect()))
    want = sorted(map(str, batch_eng._decoded_input().collect()))
    assert got == want


def test_stream_deferred_cascade_amortizes_and_catches_up(spark, tmp_path):
    """r03 verdict ask #6: per-micro-batch flushes defer the 1h/1d
    cascade (cascade_every), so a 5-batch stream pays the coarse rebuild
    twice (batch 3 + the end-of-stream catch-up), not five times — and
    the coarse tiers are provably caught up and batch-identical when
    stream_into_store returns."""
    from lindorm_tsdb_contest_java_spark import engine as EM
    from lindorm_tsdb_contest_java_spark.streaming.ingest import stream_into_store

    pdf = generate_transcripts(n_conv=30, mean_turns=20, seed=9)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    n = len(pdf) // 5
    for i in range(5):
        write_transcripts_parquet(pdf.iloc[i * n:(i + 1) * n if i < 4 else len(pdf)],
                                  f"{landing}/b{i}.parquet")

    root = str(tmp_path / "store")
    eng = stream_into_store(spark, landing, root, str(tmp_path / "ckpt"),
                            n_buckets=8, cascade_every=3,
                            max_files_per_trigger=1)
    # caught up: nothing pending, and the coarse table saw FEWER commits
    # than batches (snapshot ids are monotonic: create=0, then one per
    # cascade that actually ran — expect 2: batch 3 + final catch-up)
    assert eng._pipeline.checkpoint.cascade_pending() == set()
    t1h = eng._pipeline.table("tier_conv_1h")
    assert 0 < t1h.current().snapshot_id < 5, t1h.current().snapshot_id

    batch_eng = EM.connect(spark, str(tmp_path / "batch"), n_buckets=8)
    batch_eng.write(spark.createDataFrame(pdf))
    batch_eng.shutdown()
    got = sorted(map(str, t1h.read(spark).collect()))
    want = sorted(map(str, batch_eng._pipeline.table("tier_conv_1h")
                      .read(spark).collect()))
    assert got == want


def test_stream_into_store_l0_append(spark, tmp_path):
    """stream_into_store(l0_append=True): ordered micro-batches take the
    O(batch) delta-segment flush, the stream-end compaction folds them
    into the base layout, and every answer equals a batch-built twin."""
    from lindorm_tsdb_contest_java_spark import engine as EM
    from lindorm_tsdb_contest_java_spark.streaming.ingest import stream_into_store

    pdf = generate_transcripts(n_conv=30, mean_turns=20, seed=9)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    third = len(pdf) // 3
    landing = str(tmp_path / "landing-l0")
    os.makedirs(landing)
    bounds = [(0, third), (third, 2 * third), (2 * third, len(pdf))]
    for i, (lo, hi) in enumerate(bounds):
        write_transcripts_parquet(pdf.iloc[lo:hi], f"{landing}/b{i}.parquet")

    root = str(tmp_path / "store-l0")
    eng = stream_into_store(spark, landing, root, str(tmp_path / "ckpt-l0"),
                            n_buckets=8, max_files_per_trigger=1,
                            l0_append=True, compact_every=2)
    # compacted at stream end: delta store retired, base self-contained
    assert not eng._segments_l0.current().files
    assert eng._raw.current().files == []

    twin = EM.connect(spark, str(tmp_path / "twin-l0"), n_buckets=8)
    twin.write(spark.createDataFrame(pdf))
    twin.shutdown()
    assert sorted(map(str, eng.execute_latest_query().collect())) == \
        sorted(map(str, twin.execute_latest_query().collect()))
    assert sorted(map(str, eng._decoded_input().collect())) == \
        sorted(map(str, twin._decoded_input().collect()))
