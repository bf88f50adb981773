"""A/B the minhash-LSH bucket-stats plan: window+collect (current) vs
groupBy+join (candidate) — r05 verdict ask #3.

The round-5 sweep showed minhash_lsh_dedup running 2.4x SLOWER at
local[32] than local[8] on the same sf0.1 input (1.48 s vs 3.58 s), and
the official number creeping 2.50 -> 3.47 -> 3.54 across rounds. This
tool attributes where the time goes and compares plan variants on the
same input, same JVM, interleaved (variant order a,b,a,b,... so box
drift hits both equally).

Usage:
    SPARK_GRAFT_CPUS=8  python tools/minhash_ab.py [mult]
    SPARK_GRAFT_CPUS=32 python tools/minhash_ab.py [mult]

`mult` (default 1) unions mult copies of the sf0.1 documents with
uniquified doc_id/text, scaling n_docs without changing the dup rate.
Prints one JSON line per (variant, repeat).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark.operators.datapipe import (
    lsh_candidate_pairs, minhash_signatures, with_shingles, with_tokens,
)
from lindorm_tsdb_contest_java_spark.plans.session import get_spark


def load_docs(spark, cpus: int, mult: int):
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    if mult > 1:
        # uniquify text so bucket sizes (and the valve) behave like a
        # mult-times-larger corpus rather than mult-times-hotter buckets
        copies = [docs] + [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
                .withColumn("text", F.concat("text", F.lit(f" v{i}")))
            for i in range(1, mult)
        ]
        base = copies[0]
        for c in copies[1:]:
            base = base.unionByName(c)
        docs = base
    docs = docs.repartition(cpus * 2, "doc_id").cache()
    n = docs.count()
    return docs, n


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("minhash-ab", parallelism=cpus)
    docs, n_docs = load_docs(spark, cpus, mult)

    def run_sig_only():
        sh = with_shingles(with_tokens(docs), n=3)
        minhash_signatures(sh).select(F.sum(F.size("minhash"))).collect()

    def run_current():
        sh = with_shingles(with_tokens(docs), n=3)
        lsh_candidate_pairs(minhash_signatures(sh), "doc_id").count()

    def run_groupby_join():
        sh = with_shingles(with_tokens(docs), n=3)
        lsh_candidate_pairs(minhash_signatures(sh), "doc_id",
                            bucket_stats="groupby_join").count()

    def run_slim():
        sh = with_shingles(with_tokens(docs), n=3)
        lsh_candidate_pairs(minhash_signatures(sh), "doc_id",
                            bucket_stats="slim").count()

    variants = [("sig_only", run_sig_only), ("window", run_current),
                ("groupby_join", run_groupby_join), ("slim", run_slim)]
    # warm the JVM + python workers once with the cheapest variant
    run_sig_only()
    results: dict[str, list[float]] = {name: [] for name, _ in variants}
    for _ in range(4):
        for name, fn in variants:
            t0 = time.monotonic()
            fn()
            results[name].append(round(time.monotonic() - t0, 3))
    out = {"cpus": cpus, "mult": mult, "n_docs": n_docs,
           "walls_s": results,
           "best_s": {k: min(v) for k, v in results.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
