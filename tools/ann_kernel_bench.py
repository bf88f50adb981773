"""Embedding-math backend bench: Arrow numpy kernel vs interpreted
expression fold (r03 verdict ask #3 done-criterion: >= 5x on >= 100k
vectors). Times brute-force cosine top-k, LSH bucket assignment, and
IVF assignment+probe on a deterministic synthetic embedding table.

Usage: python tools/ann_kernel_bench.py [n_vectors] [dim]
Prints one JSON line {op: {kernel_s, expr_s, speedup}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lindorm_tsdb_contest_java_spark.operators import datapipe as DP
from lindorm_tsdb_contest_java_spark.plans.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("ann-kernel-bench", parallelism=cpus)

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((n, dim)).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": list(mat)})
    path = "/tmp/ann_kernel_bench_vecs.parquet"
    spark.createDataFrame(pdf).repartition(cpus * 2) \
        .write.mode("overwrite").parquet(path)
    vecs = spark.read.parquet(path).cache()
    vecs.count()
    qvec = [float(x) for x in mat[0]]

    # warm the python worker pool before timing
    spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(
        lambda it: (p for p in it), schema="id long").count()

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    planes = [DP.lsh_plane(p, dim) for p in range(8)]
    v = lambda: DP.F.col("embedding").cast("array<double>")  # noqa: E731
    ops = {
        "cosine_topk": lambda b: (lambda: DP.cosine_topk(
            vecs, qvec, k=10, backend=b).collect()),
        "lsh_bucket": lambda b: (lambda: vecs.select(
            DP._bucket_expr(v(), planes, b).alias("bk"))
            .agg(DP.F.sum("bk")).collect()),
        "ivf_topk": lambda b: (lambda: DP.ivf_topk(
            vecs, qvec, k=10, n_centroids=32, n_probe=2,
            backend=b).collect()),
    }
    out = {}
    for name, mk in ops.items():
        kernel_s = best_of(mk("kernel"))
        expr_s = best_of(mk("expr"))
        out[name] = {"kernel_s": kernel_s, "expr_s": expr_s,
                     "speedup": round(expr_s / kernel_s, 2)}
    print(json.dumps({"n_vectors": n, "dim": dim, "cpus": cpus, "ops": out}))
    spark.stop()


if __name__ == "__main__":
    main()
