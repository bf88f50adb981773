"""Single-conversation read locality bench (r03 verdict ask #1 done
criterion): build a segment store at BENCH_TURNS with the engine-shaped
layout (n_buckets=16, 1d chunks, 4k-row conv-range sub-segments), then
time a single-conversation time-range query

  (a) WITH the conv_id zone-map pruning (the committed read path), vs
  (b) bucket+time pruning only (the pre-r04 behavior, emulated by
      filtering conv_id after decode),

and report decoded-row volumes for both. Prints one JSON line.

    python tools/locality_bench.py [turns=24000000]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark.plans.session import get_spark
from lindorm_tsdb_contest_java_spark.sources.segments import (
    canonicalize, decode_segments, encode_segments, time_range_from_segments,
)

N_BUCKETS = 16
CHUNK_US = 86_400 * 1_000_000


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from bench import bench_table

    tpath = bench_table(turns)
    spark = get_spark("locality", parallelism=cpus)
    seg_path = os.path.join(REPO, ".bench_cache", f"locseg_{turns}")
    if not os.path.exists(seg_path):
        canon = canonicalize(spark.read.parquet(tpath),
                             n_buckets=N_BUCKETS, chunk_us=CHUNK_US)
        encode_segments(canon).write.parquet(seg_path)
    seg = spark.read.parquet(seg_path)
    n_segments = seg.count()

    conv = "conv-00017672"  # an ordinary ~100-turn conversation
    lb_ms, ub_ms = 1_704_067_200_000, 1_704_067_200_000 + 40 * 86_400_000
    lb_us, ub_us = lb_ms * 1000, ub_ms * 1000
    bucket = F.pmod(F.xxhash64(F.lit(conv)), F.lit(N_BUCKETS)).cast("int")

    def pruned_query():
        return time_range_from_segments(
            seg, conv, lb_ms, ub_ms,
            ["conv_id", "turn_idx", "text", "ts_us"], n_buckets=N_BUCKETS)

    def bucket_only_query():
        # the pre-r04 path: no conv zone columns — prune by bucket+time,
        # decode, then filter conv_id on decoded rows
        p = seg.filter((F.col("conv_bucket") == bucket)
                       & (F.col("min_ts_us") < F.lit(ub_us))
                       & (F.col("max_ts_us") >= F.lit(lb_us)))
        d = decode_segments(p, ["conv_id", "turn_idx", "text", "ts_us"])
        return d.filter((F.col("conv_id") == conv)
                        & (F.col("ts_us") >= lb_us) & (F.col("ts_us") < ub_us))

    # decoded-row volume = n_rows of the segments each plan scans
    rows_pruned = (seg.filter(
        (F.col("conv_bucket") == bucket)
        & (F.col("conv_id_min") <= conv) & (F.col("conv_id_max") >= conv)
        & (F.col("min_ts_us") < F.lit(ub_us))
        & (F.col("max_ts_us") >= F.lit(lb_us)))
        .agg(F.sum("n_rows")).collect()[0][0] or 0)
    rows_bucket = (seg.filter(
        (F.col("conv_bucket") == bucket)
        & (F.col("min_ts_us") < F.lit(ub_us))
        & (F.col("max_ts_us") >= F.lit(lb_us)))
        .agg(F.sum("n_rows")).collect()[0][0] or 0)

    # warm (page cache + JIT + python workers), then best-of-3 walls
    pruned_query().count()
    bucket_only_query().count()

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            n = fn().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), n

    wall_pruned, n1 = best_of(pruned_query)
    wall_bucket, n2 = best_of(bucket_only_query)
    assert n1 == n2, (n1, n2)

    # ---- tier-read locality (r04 verdict ask #4): conv-sorted tier files
    # let parquet row-group stats prune a single-conv tier scan; measure
    # the rows a reader MUST touch (row groups whose conv_id [min,max]
    # covers the conv) sorted vs unsorted, from the parquet footers.
    import pyarrow.parquet as pq

    from lindorm_tsdb_contest_java_spark.operators.tiers import build_conv_tier

    canon = canonicalize(spark.read.parquet(tpath),
                         n_buckets=N_BUCKETS, chunk_us=CHUNK_US)
    tier = build_conv_tier(canon)
    tier_sorted = os.path.join(REPO, ".bench_cache", f"loctier_s_{turns}")
    tier_unsorted = os.path.join(REPO, ".bench_cache", f"loctier_u_{turns}")
    # small row groups so the footer-stat granularity is visible at bench
    # scale — a real deployment's file:row-group ratio (~1 GB files of
    # 128 MB groups) is what the 128 KB groups emulate here
    wopt = {"parquet.block.size": 128 << 10}
    if not os.path.exists(tier_sorted):
        (tier.repartition(cpus).sortWithinPartitions("conv_id")
         .write.options(**wopt).parquet(tier_sorted))
    if not os.path.exists(tier_unsorted):
        tier.repartition(cpus).write.options(**wopt).parquet(tier_unsorted)

    def tier_rows_must_read(path: str) -> tuple[int, int]:
        must, total = 0, 0
        for fname in os.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, fname)).metadata
            ci = next(i for i in range(md.num_columns)
                      if md.row_group(0).column(i).path_in_schema == "conv_id")
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                st = rg.column(ci).statistics
                total += rg.num_rows
                if st is None or (st.min <= conv <= st.max):
                    must += rg.num_rows
        return must, total

    tier_must_sorted, tier_total = tier_rows_must_read(tier_sorted)
    tier_must_unsorted, _ = tier_rows_must_read(tier_unsorted)

    print(json.dumps({
        "turns": turns, "n_segments": n_segments, "n_buckets": N_BUCKETS,
        "result_rows": n1,
        "conv_zone_pruning": {"wall_s": wall_pruned,
                              "decoded_rows": int(rows_pruned)},
        "bucket_only": {"wall_s": wall_bucket,
                        "decoded_rows": int(rows_bucket)},
        "decode_reduction": round(rows_bucket / max(rows_pruned, 1), 1),
        "speedup": round(wall_bucket / wall_pruned, 2),
        "tier_rows_total": int(tier_total),
        "tier_rows_read_sorted": int(tier_must_sorted),
        "tier_rows_read_unsorted": int(tier_must_unsorted),
        "tier_read_reduction": round(
            tier_must_unsorted / max(tier_must_sorted, 1), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
