"""Multi-PROCESS N -> 4N scaling evidence (r03 verdict ask #8).

The single-JVM sweep (tools/scaling_run.py: local[N] vs local[4N]) is
capped by this box's measured process-pool memory-bandwidth ceiling, so
it cannot distinguish "the plan stops scaling" from "the box stops
scaling". This tool tightens the argument by running the SAME encode
job as K separate 4-core Spark processes over DISJOINT slices of the
cached bench input — approximating K cluster nodes with independent
schedulers, JVMs, GCs, and Python worker pools (the things a real
multi-node cluster actually separates; the memory bus remains shared,
which is stated in the output). Strong scaling: the TOTAL work is
fixed, split evenly; efficiency = (throughput at 4N cores / throughput
at N cores) / 4.

Workers synchronize on a file barrier AFTER their Spark session is up
and JIT-warmed, so process startup (constant, concurrent) never
pollutes the timed window.

    python tools/multiproc_scaling.py [turns=2000000] [procs_small=2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES_PER_PROC = 4


def _worker(slice_file: str, ready: str, go: str) -> None:
    from pyspark.sql import functions as F

    from lindorm_tsdb_contest_java_spark.plans.session import get_spark
    from lindorm_tsdb_contest_java_spark.sources.segments import (
        canonicalize, encode_segments,
    )

    with open(slice_file) as f:
        cfg = json.load(f)
    spark = get_spark(f"mp-{cfg['idx']}", parallelism=CORES_PER_PROC)
    raw = spark.read.parquet(*cfg["paths"])
    n = raw.count()
    # JIT + python-worker warmup on a small prefix of the slice
    warm = canonicalize(raw.limit(20_000), n_buckets=4,
                        chunk_us=cfg["chunk_us"])
    encode_segments(warm).write.mode("overwrite").parquet(cfg["out"] + ".warm")
    raw.agg(F.sum(F.length("text"))).collect()
    open(ready, "w").write("1")
    while not os.path.exists(go):
        time.sleep(0.05)
    t0 = time.perf_counter()
    canon = canonicalize(raw, n_buckets=cfg["n_buckets"],
                         chunk_us=cfg["chunk_us"])
    encode_segments(canon).write.mode("overwrite").parquet(cfg["out"])
    wall = time.perf_counter() - t0
    print(json.dumps({"turns": n, "wall": wall}))
    spark.stop()


def _run_level(k: int, files: list[str], turns: int, scratch: str) -> dict:
    os.makedirs(scratch, exist_ok=True)
    chunk_us = 86_400 * 1_000_000
    n_buckets = max(4, turns // k // (30 * 4000))
    procs, readies = [], []
    go = os.path.join(scratch, "GO")
    for i in range(k):
        cfg = {
            "idx": i,
            "paths": files[i::k],  # round-robin: even slice sizes
            "out": os.path.join(scratch, f"out-{i}"),
            "chunk_us": chunk_us,
            "n_buckets": n_buckets,
        }
        cf = os.path.join(scratch, f"cfg-{i}.json")
        with open(cf, "w") as f:
            json.dump(cfg, f)
        ready = os.path.join(scratch, f"READY-{i}")
        readies.append(ready)
        # fixed per-process heap at BOTH levels (a real cluster node has
        # fixed memory; the session default 12g x 8 procs would pre-commit
        # 96 GB of -Xms on this 125 GB box and thrash)
        env = dict(os.environ,
                   SPARK_DRIVER_MEM=os.environ.get("MP_DRIVER_MEM", "4g"),
                   SPARK_ACTIVE_PROCESSOR_COUNT=str(CORES_PER_PROC))
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", cf, ready, go],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=REPO, env=env))
    while not all(os.path.exists(r) for r in readies):
        time.sleep(0.1)
    open(go, "w").write("go")
    outs = []
    for p in procs:
        out, _ = p.communicate()
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))
    total = sum(o["turns"] for o in outs)
    wall = max(o["wall"] for o in outs)
    return {"procs": k, "cores": k * CORES_PER_PROC, "turns": total,
            "wall_s": round(wall, 2),
            "turns_per_sec": round(total / wall, 1),
            "per_proc_walls": [round(o["wall"], 2) for o in outs]}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(*sys.argv[2:5])
        return
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from bench import bench_table

    tpath = bench_table(turns)
    files = sorted(os.path.join(tpath, f) for f in os.listdir(tpath)
                   if f.endswith(".parquet"))
    import shutil
    results = {}
    for k in (k_small, 4 * k_small):
        scratch = f"/tmp/mp_scaling_{k}"
        shutil.rmtree(scratch, ignore_errors=True)
        results[k] = _run_level(k, files, turns, scratch)
    eff = (results[4 * k_small]["turns_per_sec"]
           / results[k_small]["turns_per_sec"]) / 4
    print(json.dumps({
        "mode": "multi-process strong scaling (independent Spark "
                "processes, shared memory bus)",
        "levels": list(results.values()),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
