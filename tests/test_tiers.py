"""Tier cascade exactness, gap-fill, and t-digest determinism.

FIXTURES.md §3.5: 1m/1h/1d count/sum/min/max cascade composition equals
direct-from-raw computation bit-exactly; avg derived only at read time.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lindorm_tsdb_contest_java_spark.functions.tdigest import (
    tdigest_build, tdigest_count, tdigest_merge, tdigest_quantile,
)
from lindorm_tsdb_contest_java_spark.operators.tiers import (
    DAY_MS, HOUR_MS, MINUTE_MS,
    build_conv_tier, build_rate_tier, gap_fill, rollup_conv_tier,
    rollup_rate_tier, turn_rate, with_avg,
)
from lindorm_tsdb_contest_java_spark.sources.segments import canonicalize

KEYS = ["conv_id", "bucket_ms"]


@pytest.fixture(scope="module")
def canon(transcripts_df):
    return canonicalize(transcripts_df, n_buckets=8).cache()


@pytest.fixture(scope="module")
def tier_1m(canon):
    return build_conv_tier(canon, MINUTE_MS).cache()


def _pdf(df, keys=KEYS):
    return df.toPandas().sort_values(keys).reset_index(drop=True)


@pytest.mark.parametrize("width", [HOUR_MS, DAY_MS])
def test_cascade_equals_direct(canon, tier_1m, width):
    """rollup(1m -> coarse) must equal building coarse from raw, exactly.

    Integer measures (count, text_len sum/min/max, latency min/max) are
    bit-exact by construction. latency_sum is float: the cascade sums in
    a different order than direct, so compare to 1e-9 rel — the stored
    tier itself is the ground truth the queries read, and within one
    tier the value is deterministic."""
    direct = _pdf(build_conv_tier(canon, width))
    cascaded = _pdf(rollup_conv_tier(tier_1m, width))
    assert direct.shape == cascaded.shape
    exact_cols = ["conv_id", "bucket_ms", "n_turns", "text_len_sum",
                  "text_len_min", "text_len_max", "latency_min", "latency_max"]
    pd.testing.assert_frame_equal(direct[exact_cols], cascaded[exact_cols])
    np.testing.assert_allclose(direct["latency_sum"], cascaded["latency_sum"], rtol=1e-9)


def test_1d_from_1h_equals_1d_from_1m(tier_1m):
    via_1h = _pdf(rollup_conv_tier(rollup_conv_tier(tier_1m, HOUR_MS), DAY_MS))
    direct = _pdf(rollup_conv_tier(tier_1m, DAY_MS))
    exact = [c for c in via_1h.columns if c != "latency_sum"]
    pd.testing.assert_frame_equal(via_1h[exact], direct[exact])
    np.testing.assert_allclose(via_1h["latency_sum"], direct["latency_sum"], rtol=1e-9)


def test_avg_derived_from_sum_count(canon, tier_1m):
    got = _pdf(with_avg(rollup_conv_tier(tier_1m, HOUR_MS)))
    expect = _pdf(canon.groupBy(
        "conv_id",
        (F.floor(F.col("ts_us") / F.lit(HOUR_MS * 1000)) * F.lit(HOUR_MS)).alias("bucket_ms"),
    ).agg((F.sum("text_len") / F.count("*")).alias("text_len_avg")))
    np.testing.assert_allclose(got["text_len_avg"], expect["text_len_avg"], rtol=1e-12)


def test_rate_tier_counts_and_digest(canon):
    r1m = build_rate_tier(canon, MINUTE_MS).cache()
    r1h = rollup_rate_tier(r1m, HOUR_MS)
    got = _pdf(r1h, ["role", "tool", "bucket_ms"])
    expect = _pdf(canon.groupBy(
        "role", "tool",
        (F.floor(F.col("ts_us") / F.lit(HOUR_MS * 1000)) * F.lit(HOUR_MS)).alias("bucket_ms"),
    ).agg(F.count("*").alias("n_turns")), ["role", "tool", "bucket_ms"])
    assert (got["n_turns"].to_numpy() == expect["n_turns"].to_numpy()).all()
    # digest weight always equals the row count it summarizes
    for _, row in got.iterrows():
        assert tdigest_count(bytes(row["latency_digest"])) == row["n_turns"]
    rates = turn_rate(r1h, HOUR_MS).toPandas()
    assert np.allclose(rates["turns_per_s"], rates["n_turns"] / 3600.0)


def test_gap_fill_dense_and_forward_fill(spark, tier_1m):
    one = tier_1m.filter(F.col("conv_id") == "conv-00000000")
    lb = int(one.agg(F.min("bucket_ms")).collect()[0][0])
    ub = lb + 30 * MINUTE_MS
    dense = gap_fill(tier_1m.filter(F.col("conv_id") == "conv-00000000"),
                     lb, ub, MINUTE_MS, ["conv_id"])
    pdf = dense.toPandas().sort_values("bucket_ms")
    assert len(pdf) == 30
    assert list(pdf["bucket_ms"]) == [lb + i * MINUTE_MS for i in range(30)]
    filled = gap_fill(tier_1m.filter(F.col("conv_id") == "conv-00000000"),
                      lb, ub, MINUTE_MS, ["conv_id"], forward_fill=True)
    fp = filled.toPandas().sort_values("bucket_ms")
    assert fp["n_turns"].notna().all(), "forward fill must close gaps"
    # un-filled version must have had gaps for this to be a real test
    assert pdf["n_turns"].isna().any()


# ---------- t-digest unit properties ----------

def test_tdigest_deterministic_and_order_insensitive():
    rng = np.random.default_rng(1)
    v = rng.exponential(20, 10_000)
    a = tdigest_build(v)
    b = tdigest_build(v[::-1].copy())
    assert a == b  # sorted internally -> multiset-deterministic


def test_tdigest_merge_close_to_rebuild():
    rng = np.random.default_rng(2)
    parts = [rng.exponential(20, 5000) for _ in range(8)]
    merged = tdigest_merge([tdigest_build(p) for p in parts])
    rebuilt = tdigest_build(np.concatenate(parts))
    qs = np.array([0.01, 0.25, 0.5, 0.9, 0.99])
    qm = tdigest_quantile(merged, qs)
    qr = tdigest_quantile(rebuilt, qs)
    exact = np.quantile(np.concatenate(parts), qs)
    np.testing.assert_allclose(qm, exact, rtol=0.05)
    np.testing.assert_allclose(qm, qr, rtol=0.05)


def test_tdigest_quantile_accuracy_uniform():
    v = np.arange(100_000, dtype=np.float64)
    d = tdigest_build(v)
    for q in (0.001, 0.5, 0.999):
        assert abs(tdigest_quantile(d, q) - q * 100_000) < 500


def test_tdigest_empty_and_single():
    assert np.isnan(tdigest_quantile(tdigest_build(np.array([])), 0.5))
    assert tdigest_quantile(tdigest_build(np.array([7.0])), 0.9) == 7.0


def test_tier_percentiles_close_to_exact(spark, transcripts_df):
    """Percentile reads served from merged tier t-digests track the exact
    quantiles of the raw latencies (the read side of the sketch cascade)."""
    import numpy as np
    from lindorm_tsdb_contest_java_spark.operators.tiers import (
        build_rate_tier, rollup_rate_tier, tier_percentiles,
    )
    from lindorm_tsdb_contest_java_spark.sources.segments import canonicalize

    canon = canonicalize(transcripts_df, n_buckets=8, grain="conv").cache()
    tier_1m = build_rate_tier(canon, 60_000)
    tier_1h = rollup_rate_tier(tier_1m, 3_600_000)
    lo = canon.agg(F.min("ts_us")).collect()[0][0] // 1000
    hi = canon.agg(F.max("ts_us")).collect()[0][0] // 1000 + 1
    got = tier_percentiles(tier_1h, lo - 3_600_000, hi + 3_600_000,
                           qs=(0.5, 0.9)).toPandas()
    raw = canon.select("role", "tool", "latency_s").toPandas()
    assert len(got) > 0
    for r in got.itertuples():
        lat = raw[(raw["role"] == r.role) & (raw["tool"] == r.tool)]["latency_s"]
        assert r.n_turns == len(lat)
        for q, est in ((0.5, r.p50), (0.9, r.p90)):
            # rank-space accuracy: the estimate's true rank is within 2%
            rank = (lat.to_numpy() <= est).mean()
            assert abs(rank - q) < 0.02, (r.role, r.tool, q, est, rank)
    canon.unpersist()
