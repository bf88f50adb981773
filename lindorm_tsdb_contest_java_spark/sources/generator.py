"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Capability analog of the reference's self-test generator
(`example/DataGenerator.java:20-79`: 5,000 series × 36,000 points on a 1 s
grid, low-cardinality strings, uniform doubles), re-expressed on the
transcript data model mandated by BASELINE.json:

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

Properties guaranteed (mirroring the reference write contract,
/root/reference/interface.md:28-35):
- bit-for-bit reproducible for a given (seed, n_conv, ...) tuple;
- no nulls; (conv_id, turn_idx) unique; ts strictly increasing per conv;
- skew: Zipf(a) conversation sizes plus one designated hot conversation
  holding `hot_factor`× the median turns (exercises salting/AQE);
- text: seeded word salad incl. multibyte tokens and ~1% empty strings.

Pure numpy/pyarrow — writes parquet directly, no Spark needed, so the
same table feeds pytest, the pandas oracle, and bench.py identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
ROLE_W = np.array([0.42, 0.42, 0.02, 0.14])
TOOLS = np.array(
    ["bash", "grep", "read", "write", "edit", "glob", "search",
     "fetch", "run", "test", "lint", "diff"], dtype=object)
WORDS = np.array(
    ["the", "a", "spark", "table", "scan", "merge", "join", "filter",
     "window", "batch", "stream", "row", "column", "vector", "hash",
     "sort", "agg", "query", "data", "key", "value", "fast", "slow",
     "big", "small", "part", "order", "line", "customer", "dup",
     "日本語", "токен", "emoji🙂", "ñandú", "多字节", "främja"], dtype=object)
EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def generate_transcripts(
    n_conv: int = 200,
    mean_turns: int = 40,
    seed: int = 42,
    zipf_a: float = 1.3,
    hot_factor: int = 50,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)

    # conversation sizes: Zipf tail clamped, scaled to hit ~n_conv*mean_turns
    raw = rng.zipf(zipf_a, n_conv).astype(np.int64)
    raw = np.clip(raw, 1, mean_turns * 200)
    sizes = np.maximum(1, (raw * (n_conv * mean_turns / max(1, raw.sum()))).astype(np.int64))
    sizes[0] = max(1, int(np.median(sizes)) * hot_factor)  # conv-00000000 is hot

    total = int(sizes.sum())
    conv_idx = np.repeat(np.arange(n_conv), sizes)
    conv_id = np.array([f"conv-{i:08d}" for i in range(n_conv)], dtype=object)[conv_idx]

    # turn_idx: 0..len-1 within each conversation
    starts = np.zeros(n_conv, dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    turn_idx = (np.arange(total) - starts[conv_idx]).astype(np.int32)

    # ts: per-conv start offset + strictly increasing exp(20s) gaps (>=1ms)
    conv_start = EPOCH_2024_US + rng.integers(0, 30 * 86_400, n_conv) * 1_000_000
    gaps_us = np.maximum(1_000, (rng.exponential(20.0, total) * 1_000).astype(np.int64) * 1_000)
    gaps_us[turn_idx == 0] = 0
    ts_us = conv_start[conv_idx] + _segmented_cumsum(gaps_us, starts)

    role = rng.choice(ROLES, total, p=ROLE_W)
    tool = np.where(role == "tool", rng.choice(TOOLS, total), "").astype(object)

    # text: word salad, lognormal word counts, ~1% empty
    n_words = np.clip(rng.lognormal(1.8, 0.8, total), 0, 400).astype(np.int64)
    n_words[rng.random(total) < 0.01] = 0
    all_words = rng.choice(WORDS, int(n_words.sum()))
    bounds = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(n_words, out=bounds[1:])
    joined = pd.Series(all_words, dtype=object)
    row_of_word = np.repeat(np.arange(total), n_words)
    text = np.full(total, "", dtype=object)
    if len(joined):
        agg = joined.groupby(row_of_word).agg(" ".join)
        text[agg.index.to_numpy()] = agg.to_numpy()

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def _segmented_cumsum(values: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each segment start, vectorized."""
    c = np.cumsum(values)
    offsets = np.zeros(len(values), dtype=values.dtype)
    base = c[seg_starts] - values[seg_starts]
    seg_of = np.zeros(len(values), dtype=np.int64)
    seg_of[seg_starts[1:]] = 1
    seg_of = np.cumsum(seg_of)
    return c - base[seg_of]


def generate_dups_variant(df: pd.DataFrame, frac: float = 0.01, seed: int = 43) -> pd.DataFrame:
    """Duplicate `frac` of (conv_id, turn_idx) keys with newer ts and altered
    text — the upsert/dedup fixture (reference: same key overwrites,
    TSDBEngine.java:85-92)."""
    rng = np.random.default_rng(seed)
    pick = rng.random(len(df)) < frac
    dups = df[pick].copy()
    dups["ts"] = dups["ts"] + pd.to_timedelta(rng.integers(1, 10_000, pick.sum()), unit="ms")
    dups["text"] = "[edited] " + dups["text"].astype(str)
    return pd.concat([df, dups], ignore_index=True)


def write_transcripts_parquet(df: pd.DataFrame, path: str) -> None:
    table = pa.Table.from_pandas(df, preserve_index=False)
    # pandas datetime64[ns] -> TIMESTAMP(NANOS), which Spark's reader
    # rejects; the generator is ms-quantized so micros is lossless
    i = table.schema.get_field_index("ts")
    table = table.set_column(i, pa.field("ts", pa.timestamp("us")),
                             table.column("ts").cast(pa.timestamp("us")))
    pq.write_table(table, path, compression="zstd")
