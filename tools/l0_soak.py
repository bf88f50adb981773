"""L0 streaming soak (r04 verdict ask #8): drive 100+ forward-append
micro-batches through the engine's L0 flush with periodic compaction and
record, per flush: wall seconds, l0 delta-file count, and the committed
read fan-in (base + l0 segment files a committed read unions). The point
being evidenced: with `compact_every`, read fan-in and flush wall stay
BOUNDED on an unbounded stream — the l0 file count saw-tooths between
compactions instead of growing, and the flush wall is flat (O(batch),
never O(history)).

    python tools/l0_soak.py [n_batches=100] [compact_every=16]

Prints one JSON line with the curves plus summary stats.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lindorm_tsdb_contest_java_spark import engine as eng  # noqa: E402
from lindorm_tsdb_contest_java_spark.plans.session import get_spark  # noqa: E402

BASE_S = 1_704_067_200
N_CONVS = 50
TURNS_PER_BATCH = 40  # per conv -> 2000 rows/batch


def batch_pdf(b: int) -> pd.DataFrame:
    rows = []
    for c in range(N_CONVS):
        for t in range(TURNS_PER_BATCH):
            turn = b * TURNS_PER_BATCH + t
            rows.append((f"soak-{c:03d}", turn,
                         "user" if turn % 2 else "assistant",
                         f"text {c} {turn} " + "z" * (turn % 19), "-",
                         pd.Timestamp((BASE_S + c + turn * 67) * 10**9)))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("l0soak", parallelism=cpus)
    import shutil
    root = os.path.join(REPO, ".bench_cache", "l0_soak_store")
    shutil.rmtree(root, ignore_errors=True)
    e = eng.connect(spark, root, n_buckets=8, l0_append=True)

    # JIT/worker warmup outside the recorded curve (one throwaway store)
    warm_root = os.path.join(REPO, ".bench_cache", "l0_soak_warm")
    shutil.rmtree(warm_root, ignore_errors=True)
    w = eng.connect(spark, warm_root, n_buckets=8, l0_append=True)
    for b in range(3):
        w.write(spark.createDataFrame(batch_pdf(b)))
        w.shutdown(cascade=False)

    walls, l0_files, fan_in, l0_rows = [], [], [], []
    for b in range(n_batches):
        pdf = batch_pdf(b)
        t0 = time.perf_counter()
        e.write(spark.createDataFrame(pdf))
        e.shutdown(cascade=False)
        if compact_every and (b + 1) % compact_every == 0:
            e.compact(cascade=False)
        walls.append(round(time.perf_counter() - t0, 3))
        nl0 = len(e._segments_l0.current().files)
        l0_files.append(nl0)
        fan_in.append(len(e._segments.current().files) + nl0)
    e.run_cascade()

    # flat-wall evidence: mean of the last quarter vs the first quarter
    q = max(1, n_batches // 4)
    head, tail = float(np.mean(walls[:q])), float(np.mean(walls[-q:]))
    out = {
        "n_batches": n_batches, "rows_per_batch": N_CONVS * TURNS_PER_BATCH,
        "compact_every": compact_every, "cpus": cpus,
        "wall_s": walls, "l0_files": l0_files, "read_fan_in_files": fan_in,
        "wall_first_quarter_mean_s": round(head, 3),
        "wall_last_quarter_mean_s": round(tail, 3),
        "wall_growth_ratio": round(tail / head, 3),
        "max_l0_files": max(l0_files),
        "max_read_fan_in": max(fan_in),
        "total_rows": n_batches * N_CONVS * TURNS_PER_BATCH,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
