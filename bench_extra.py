"""Round-7 optimization harness (NOT the driver-timed bench — bench.py is
frozen). Reproduces each bench.py query, captures .explain("formatted")
into plans/r07/<name>_<tag>.txt, and times each query with the same
best-of-N discipline so before/after deltas are measured in ONE session.

Usage:
  python bench_extra.py plans <tag>      # capture plans only (fast)
  python bench_extra.py time [names...]  # time queries (best-of-N)
  python bench_extra.py profile_encode   # pure-Python encode kernel profile
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def _session(cpus: int):
    from lindorm_tsdb_contest_java_spark.plans.session import get_spark
    return get_spark("bench_extra", parallelism=cpus)


def _setup(spark, sf_dir, cpus, n_turns_target=4_000_000):
    """Mirror bench.py's inputs exactly."""
    from bench import bench_table
    from lindorm_tsdb_contest_java_spark.sources.segments import (
        canonicalize, encode_segments,
    )
    tpath = bench_table(n_turns_target)
    raw = spark.read.parquet(tpath)
    n_turns = raw.count()
    spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long").count()
    chunk_us = 86_400 * 1_000_000
    n_buckets = max(8, min(1024, n_turns // (30 * 4000)))
    seg_path = os.path.join(CACHE_DIR, f"segments_{n_turns}_{cpus}.parquet")
    if not os.path.exists(seg_path):
        encode_segments(canonicalize(raw, n_buckets=n_buckets, chunk_us=chunk_us)) \
            .write.mode("overwrite").parquet(seg_path)
    segments = spark.read.parquet(seg_path)
    canon = canonicalize(raw, grain="conv").cache()
    canon.count()
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cpus * 2, "doc_id").cache())
    docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return dict(raw=raw, segments=segments, canon=canon, docs=docs, emb=emb,
                qvec=qvec, n_buckets=n_buckets, chunk_us=chunk_us,
                seg_path=seg_path, n_turns=n_turns)


def _query_dfs(spark, ctx, sf_dir):
    """name -> (build_df, action) mirroring bench.py's timed bodies."""
    import __spark_entry__ as E
    from lindorm_tsdb_contest_java_spark.operators import queries as Q
    from lindorm_tsdb_contest_java_spark.operators.datapipe import (
        cosine_topk, lsh_candidate_pairs, minhash_signatures, with_shingles,
        with_tokens,
    )
    from lindorm_tsdb_contest_java_spark.operators.tiers import (
        DAY_MS, HOUR_MS, MINUTE_MS, build_conv_tier, build_latest_tier,
        latest_from_tier, rollup_conv_tier,
    )
    from lindorm_tsdb_contest_java_spark.sources.segments import (
        canonicalize, decode_segments, encode_segments,
    )
    canon, segments, docs = ctx["canon"], ctx["segments"], ctx["docs"]
    hot = "conv-00000000"
    lb = 1_704_067_200_000
    lt_path = os.path.join(CACHE_DIR, "tier_latest.parquet")
    if not os.path.exists(lt_path):
        build_latest_tier(canon).write.mode("overwrite").parquet(lt_path)
    lt = spark.read.parquet(lt_path)

    def rollup_encode_df():
        return encode_segments(canonicalize(
            ctx["raw"], n_buckets=ctx["n_buckets"], chunk_us=ctx["chunk_us"]))

    def tier_df():
        return rollup_conv_tier(rollup_conv_tier(
            build_conv_tier(canon, MINUTE_MS), HOUR_MS), DAY_MS)

    return {
        "rollup_encode": (rollup_encode_df,
                          lambda df: df.write.mode("overwrite").parquet(ctx["seg_path"])),
        "tier_cascade": (tier_df,
                         lambda df: df.write.mode("overwrite").parquet(
                             os.path.join(CACHE_DIR, "t1d.parquet"))),
        "decode_scan": (lambda: decode_segments(
            segments, ["conv_id", "ts_us", "text_len", "latency_s"])
            .agg(F.sum("text_len"), F.sum("latency_s")),
            lambda df: df.collect()),
        "downsample": (lambda: Q.downsample(
            canon, hot, "text_len", lb, lb + 31 * 86_400_000, 3_600_000,
            "AVG", "GREATER", 10), lambda df: df.collect()),
        "latest": (lambda: Q.latest(canon, None, ["turn_idx", "ts_us"]),
                   lambda df: df.count()),
        "latest_tier": (lambda: latest_from_tier(lt, None, ["turn_idx", "ts_us"]),
                        lambda df: df.count()),
        "hourly_role_rates": (lambda: E.queries()["hourly_role_rates"](spark, sf_dir),
                              lambda df: df.count()),
        "tpch_q1": (lambda: E.queries()["tpch_q1"](spark, sf_dir),
                    lambda df: df.collect()),
        "minhash_lsh_dedup": (lambda: lsh_candidate_pairs(
            minhash_signatures(with_shingles(with_tokens(docs), n=3)), "doc_id"),
            lambda df: df.count()),
        "ann_cosine_topk": (lambda: cosine_topk(
            ctx["emb"].filter(F.col("vec_id") > 0), ctx["qvec"], k=10),
            lambda df: df.collect()),
    }


def capture_plans(tag: str, names=None):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = _session(cpus)
    ctx = _setup(spark, sf_dir, cpus)
    qs = _query_dfs(spark, ctx, sf_dir)
    for name, (build, _act) in qs.items():
        if names and name not in names:
            continue
        df = build()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote plans/r07/{name}_{tag}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


def time_queries(names=None, repeats=None, label=""):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = repeats or int(os.environ.get("BENCH_REPEATS", "4"))
    spark = _session(cpus)
    ctx = _setup(spark, sf_dir, cpus)
    qs = _query_dfs(spark, ctx, sf_dir)
    out = {}
    for name, (build, act) in qs.items():
        if names and name not in names:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(repeats + 1):  # first rep is untimed warmup
            t0 = time.perf_counter()
            act(build())
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(samples[1:]), "samples": samples}
        print(name, out[name], flush=True)
    print(json.dumps({"label": label, "timings": {k: v["best"] for k, v in out.items()}}))
    spark.stop()


def profile_encode():
    """Pure-Python per-codec timing over real bench-table groups."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from bench import bench_table
    from lindorm_tsdb_contest_java_spark.functions.codecs import (
        dict_encode, int_encode, latency_encode, text_encode,
    )
    from lindorm_tsdb_contest_java_spark.functions.codecs.strings import _token_blob
    tpath = bench_table(4_000_000)
    f = sorted(os.listdir(tpath))[0]
    tbl = pq.read_table(os.path.join(tpath, f))
    # emulate one bucket-chunk group: sort by conv/turn, slice 4096 rows
    import pandas as pd
    pdf = tbl.to_pandas().sort_values(["conv_id", "turn_idx"]).head(65536)
    ts = (pdf["ts"].astype("int64") // 1000).to_numpy()
    tlen = pdf["text"].str.len().to_numpy().astype(np.int64)
    lat = np.diff(ts, prepend=ts[0]) / 1e6
    conv = pa.array(pdf["conv_id"], type=pa.string())
    role = pa.array(pdf["role"], type=pa.string())
    tool = pa.array(pdf["tool"], type=pa.string())
    text = pa.array(pdf["text"], type=pa.string())
    turn = pdf["turn_idx"].to_numpy().astype(np.int64)
    n = 65536 // 4096
    slices = [slice(i * 4096, (i + 1) * 4096) for i in range(n)]

    def t(fn, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for s in slices:
                fn(s)
            best = min(best, time.perf_counter() - t0)
        return best / n * 1000  # ms per 4096-row group

    from lindorm_tsdb_contest_java_spark.functions.codecs.dod import int_encode as ie
    res = {
        "int_ts": t(lambda s: ie(ts[s])),
        "int_turn": t(lambda s: ie(turn[s])),
        "int_tlen": t(lambda s: ie(tlen[s])),
        "latency": t(lambda s: latency_encode(lat[s], ts[s], np.array([0]))),
        "dict_conv": t(lambda s: dict_encode(conv.slice(s.start, 4096))),
        "dict_role": t(lambda s: dict_encode(role.slice(s.start, 4096))),
        "dict_tool": t(lambda s: dict_encode(tool.slice(s.start, 4096))),
        "text": t(lambda s: text_encode(text.slice(s.start, 4096), level=3,
                                        ext_lengths=tlen[s])),
        "text_token_only": t(lambda s: _token_blob(
            text.slice(s.start, 4096), 3)),
    }
    total = sum(res.values())
    for k, v in res.items():
        print(f"{k:18s} {v:8.2f} ms/group  {100*v/total:5.1f}%")
    print(f"{'TOTAL':18s} {total:8.2f} ms/group")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "before",
                      names=sys.argv[3:] or None)
    elif cmd == "time":
        time_queries(names=sys.argv[2:] or None)
    elif cmd == "profile_encode":
        profile_encode()
    else:
        raise SystemExit(f"unknown command {cmd}")
