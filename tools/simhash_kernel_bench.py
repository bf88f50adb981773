"""SimHash backend microbench: Arrow vote kernel vs pure-expression form.

Builds >=100k documents (the sf documents table unioned with itself under
shifted ids), computes the 48-bit simhash of every doc with each backend,
and prints one JSON line. Evidence for the round-2 verdict ask #6: the
kernel must be >=5x the interpreted-lambda expression form at this size.

Run:  python tools/simhash_kernel_bench.py [sf_dir] [min_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark.operators.datapipe import simhash_column
from lindorm_tsdb_contest_java_spark.plans.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    min_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("simhash-bench", parallelism=int(
        os.environ.get("SPARK_GRAFT_CPUS", "16")))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n0 = docs.count()
    copies = max(1, -(-min_docs // n0))
    parts = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
             for i in range(copies)]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.repartition(64).cache()
    n = big.count()

    def probe(backend: str):
        # mod keeps the 48-bit sum inside int64 under ANSI mode
        sh = F.pmod(simhash_column(F.col("text"), backend), F.lit(1_000_003))
        return big.select(F.sum(sh).alias("s"))

    def timed(backend: str) -> float:
        probe(backend).collect()  # warm (JIT + python workers), then best of 2
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            probe(backend).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    assert probe("kernel").collect() == probe("expr").collect()

    kernel_s = timed("kernel")
    expr_s = timed("expr")
    print(json.dumps({
        "n_docs": n, "kernel_s": round(kernel_s, 3), "expr_s": round(expr_s, 3),
        "speedup": round(expr_s / kernel_s, 2),
        "kernel_docs_per_s": round(n / kernel_s, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
