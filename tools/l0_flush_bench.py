"""L0 delta-append flush vs chunk-rewrite flush at growing hot-chunk fill.

Reproduces the BENCH/BASELINE.md "L0 delta-segment flush" table: a 4k-row
ordered batch appended into a single hot chunk (chunk_us = 40 days so
every row shares one chunk — the streaming steady state in miniature),
at several base fills. The rewrite flush re-encodes the whole chunk
(cost grows with fill); the l0 flush appends delta segments and rebuilds
the chunk's 1m tiers from a numeric-only decode (flat). Twin-engine
query equality is asserted at the end.

Usage: python tools/l0_flush_bench.py [fills...]   (default 100k 400k 800k)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from lindorm_tsdb_contest_java_spark import engine as ENG
from lindorm_tsdb_contest_java_spark.plans.session import get_spark
from lindorm_tsdb_contest_java_spark.sources.generator import generate_transcripts

CHUNK_US = 40 * 86400 * 1_000_000  # one chunk holds the whole corpus
WORK = "/tmp/l0-flush-bench"


def main():
    fills = [int(x) for x in sys.argv[1:]] or [100_000, 400_000, 800_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("l0-flush-bench", parallelism=cpus)
    full = generate_transcripts(n_conv=16000, mean_turns=50, seed=11)
    gmax = full["ts"].max()
    conv_last = (full.groupby("conv_id").agg(last_t=("turn_idx", "max"))
                 .reset_index().head(2000))

    def mk_batch(k):
        rows = [(r.conv_id, int(r.last_t) + k, "user",
                 f"appended {k} " + "y" * 40, "-",
                 gmax + pd.Timedelta(seconds=600 * k)
                 + pd.Timedelta(milliseconds=int(i)))
                for i, (_, r) in enumerate(conv_last.iterrows())]
        return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                           "text", "tool", "ts"])

    # JIT warmup through both flush paths (timings need a warm JVM)
    for flag in (False, True):
        root = f"{WORK}/warm"
        shutil.rmtree(root, ignore_errors=True)
        w = ENG.connect(spark, root, n_buckets=16, chunk_us=CHUNK_US,
                        l0_append=flag)
        w.write(spark.createDataFrame(full.head(20000)))
        w.shutdown()
        w.write(spark.createDataFrame(mk_batch(1).head(500)))
        w.shutdown()

    for n_base in fills:
        base = full.head(n_base)
        line = [f"fill={n_base}"]
        for mode, flag in (("rewrite", False), ("l0", True)):
            root = f"{WORK}/{mode}"
            shutil.rmtree(root, ignore_errors=True)
            e = ENG.connect(spark, root, n_buckets=16, chunk_us=CHUNK_US,
                            l0_append=flag)
            e.write(spark.createDataFrame(base))
            e.shutdown()
            incs = []
            for k in (1, 2):
                e.write(spark.createDataFrame(mk_batch(k)))
                t0 = time.perf_counter()
                e.shutdown()
                incs.append(round(time.perf_counter() - t0, 1))
                if flag:
                    assert e._segments_l0.current().files, "not an l0 flush"
            line.append(f"{mode} incs {incs}")
        print("  ".join(line), flush=True)

    a = ENG.connect(spark, f"{WORK}/l0", l0_append=True)
    b = ENG.connect(spark, f"{WORK}/rewrite")
    qa = sorted(map(str, a.execute_latest_query(
        None, ["turn_idx", "ts_us"]).collect()))
    qb = sorted(map(str, b.execute_latest_query(
        None, ["turn_idx", "ts_us"]).collect()))
    print("latest equal:", qa == qb)
    t0 = time.perf_counter()
    a.compact()
    print("compact wall", round(time.perf_counter() - t0, 1),
          "l0 empty:", not a._segments_l0.current().files)


if __name__ == "__main__":
    main()
