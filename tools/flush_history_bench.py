"""Flush cost vs committed-history size (BENCH/BASELINE.md §flush-cost).

The memtable-cost-flush claim: appending the SAME forward batch must
cost the same wall regardless of how much history is already committed
(O(batch + touched chunks), never O(table)). This tool rebuilds the r03
table on current code: for each history size, build a fresh store from
the first H turns of the deterministic bench corpus, shut down, then
time a 50k-turn strictly-forward append flush (every conversation's new
turns extend past its committed latest: ts shifted beyond the corpus
max, turn_idx continued past each conversation's committed max).

    python tools/flush_history_bench.py [cpus=16] [sizes=200000,1000000,4000000]
Prints one JSON line per history size.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd
from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark import engine as eng
from lindorm_tsdb_contest_java_spark.plans.session import get_spark


def forward_batch(spark, hist_df, n_rows: int):
    """50k strictly-forward rows: continue each committed conversation
    past its max turn/ts (deterministic, derived from the history)."""
    latest = (hist_df.groupBy("conv_id")
              .agg(F.max("turn_idx").alias("mt"),
                   F.max("ts").alias("mts"))
              .orderBy("conv_id").limit(2000).toPandas())
    per_conv = max(1, n_rows // len(latest))
    rows = []
    base = pd.Timestamp("2024-06-01")  # beyond the 30-day corpus span
    for _, r in latest.iterrows():
        for k in range(per_conv):
            rows.append((r["conv_id"], int(r["mt"]) + 1 + k, "user",
                         f"fwd {k} xyz", "-",
                         base + pd.Timedelta(seconds=int(r["mt"]) + k)))
        if len(rows) >= n_rows:
            break
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    return spark.createDataFrame(pdf)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sizes = ([int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2
             else [200_000, 1_000_000, 4_000_000])
    spark = get_spark("flush-hist", parallelism=cpus)
    from bench import bench_table
    tpath = bench_table(max(sizes))
    raw = spark.read.parquet(tpath)

    for h in sizes:
        root = f"/root/repo/.bench_cache/fh_{h}"
        import shutil
        shutil.rmtree(root, ignore_errors=True)
        hist = raw.limit(h).cache()
        hist.count()
        e = eng.connect(spark, root, n_buckets=16)
        e.write(hist)
        t0 = time.perf_counter()
        e.shutdown()
        initial_s = time.perf_counter() - t0
        batch = forward_batch(spark, hist, 50_000)
        e.write(batch)
        t0 = time.perf_counter()
        e.shutdown()
        append_s = time.perf_counter() - t0
        print(json.dumps({"history_turns": h, "cpus": cpus,
                          "initial_flush_s": round(initial_s, 1),
                          "append_50k_flush_s": round(append_s, 1)}),
              flush=True)
        hist.unpersist()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
