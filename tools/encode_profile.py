"""Isolate the encode pipeline stages at a given parallelism.

    python tools/encode_profile.py <cpus> [turns]
Prints per-phase wall: scan+dedup+derive (canonicalize materialized),
groupBy+applyInPandas encode (count only), and parquet write.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
turns = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000

from bench import bench_table
from lindorm_tsdb_contest_java_spark.plans.session import get_spark
from lindorm_tsdb_contest_java_spark.sources.segments import canonicalize, encode_segments

tpath = bench_table(turns)
spark = get_spark("prof", parallelism=cpus, shuffle_partitions=max(cpus, 16))
spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(
    lambda it: (p for p in it), schema="id long").count()

raw = spark.read.parquet(tpath)
chunk_us = 86_400 * 1_000_000
n_buckets = max(8, min(1024, turns // (30 * 4000)))

t0 = time.perf_counter()
canon = canonicalize(raw, n_buckets=n_buckets, chunk_us=chunk_us)
canon.write.mode("overwrite").parquet("/root/repo/.bench_cache/prof_canon")
t1 = time.perf_counter()
canon2 = spark.read.parquet("/root/repo/.bench_cache/prof_canon")
segs = encode_segments(canon2)
n = segs.count()
t2 = time.perf_counter()
encode_segments(canon2).write.mode("overwrite").parquet("/root/repo/.bench_cache/prof_segs")
t3 = time.perf_counter()
print(f"cpus={cpus} canonicalize+write={t1-t0:.2f}s encode_count={t2-t1:.2f}s "
      f"encode_write={t3-t2:.2f}s groups={n}")
spark.stop()
