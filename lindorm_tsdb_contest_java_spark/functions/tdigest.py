"""Deterministic t-digest quantile sketch (pure numpy, vectorized).

The reference engine has no percentile operator (its only aggregators are
AVG and MAX, structs/Aggregator.java:28-31); latency percentiles are an
additive requirement from the target spec. This is a from-scratch
implementation of the t-digest idea (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests") with the k1 scale function:

    k(q) = (delta / 2pi) * arcsin(2q - 1)

Determinism: values are sorted before clustering, centroids are assigned
by floor(k(q_mid)) — a pure function of the sorted multiset — and merges
re-cluster the lexsorted centroid set the same way. Same multiset in,
same digest out, regardless of partition order (the property the tier
cascade tests rely on).

Serialization: <u64 n_centroids><f64 means...><f64 weights...>, suitable
for a BinaryType tier column.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<Q")


def _k(q: np.ndarray, delta: float) -> np.ndarray:
    q = np.clip(q, 0.0, 1.0)
    return (delta / (2 * np.pi)) * np.arcsin(2 * q - 1)


def _cluster(means: np.ndarray, weights: np.ndarray, delta: float):
    """Re-cluster (mean, weight) pairs sorted by mean into k-index buckets."""
    total = weights.sum()
    cum = np.cumsum(weights)
    q_mid = (cum - weights / 2) / total
    bucket = np.floor(_k(q_mid, delta)).astype(np.int64)
    # group consecutive equal buckets
    edges = np.flatnonzero(np.diff(bucket)) + 1
    starts = np.r_[0, edges]
    wsum = np.add.reduceat(weights, starts)
    msum = np.add.reduceat(means * weights, starts)
    return msum / wsum, wsum


def tdigest_build(values: np.ndarray, delta: float = 100.0) -> bytes:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return _HDR.pack(0)
    v = np.sort(v, kind="stable")
    means, weights = _cluster(v, np.ones_like(v), delta)
    return _serialize(means, weights)


def tdigest_merge(blobs: list[bytes], delta: float = 100.0) -> bytes:
    parts = [_deserialize(b) for b in blobs]
    parts = [(m, w) for m, w in parts if m.size]
    if not parts:
        return _HDR.pack(0)
    means = np.concatenate([m for m, _ in parts])
    weights = np.concatenate([w for _, w in parts])
    order = np.lexsort((weights, means))
    means, weights = _cluster(means[order], weights[order], delta)
    return _serialize(means, weights)


def tdigest_quantile(blob: bytes, q: float | np.ndarray):
    means, weights = _deserialize(blob)
    if means.size == 0:
        return np.nan if np.isscalar(q) else np.full(np.shape(q), np.nan)
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64)) * total
    out = np.interp(qs, cum, means, left=means[0], right=means[-1])
    return float(out[0]) if np.isscalar(q) else out


def tdigest_count(blob: bytes) -> float:
    _, weights = _deserialize(blob)
    return float(weights.sum())


def _serialize(means: np.ndarray, weights: np.ndarray) -> bytes:
    return _HDR.pack(means.size) + means.astype("<f8").tobytes() + weights.astype("<f8").tobytes()


def _deserialize(blob: bytes):
    (n,) = _HDR.unpack_from(blob, 0)
    means = np.frombuffer(blob, dtype="<f8", count=n, offset=8)
    weights = np.frombuffer(blob, dtype="<f8", count=n, offset=8 + 8 * n)
    return means, weights
