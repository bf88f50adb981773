"""Training-data pipeline operators: dedup, similarity search, text analysis.

These have no reference counterpart (the reference is a pure TSDB); they
are the large-scale-pipeline operations the target spec adds as
first-class components. Everything stays JVM-side (built-in higher-order
functions) except simhash, which uses a vectorized pandas UDF.

Scale notes (the part that matters at 100 TB):
- exact dedup / fingerprinting: one hash-groupBy, map-side partial agg;
- MinHash+LSH: signatures are computed per-row with array expressions
  (no shuffle), candidates come from ONE groupBy on band keys — the
  classic O(n) LSH plan; only candidate pairs (a tiny set) are verified;
- n-gram Jaccard: shingle-explode + self-join on shingle is quadratic in
  rows-per-identical-shingle only; frequent-shingle skew is the hot-key
  risk → drop top-frequency shingles (stopword-shingle filter) before
  joining, AQE skew-join handles the remainder;
- brute-force ANN is the correctness baseline (broadcast the query
  vector, one pass, top-k via orderBy+limit which Spark executes as
  TakeOrdered, no full sort); the LSH-bucketed variant is the scale path:
  candidates come from same-bucket co-location, cutting the cross
  product by ~2^n_planes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


# ---------- text primitives ----------

def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "tokens",
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit("")),
    )


def with_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Word n-gram shingles via sequence+transform (JVM-side, no UDF)."""
    tokens = F.col("tokens")
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(-1)))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + k + 1) for k in range(n)])
    return df.withColumn(
        "shingles",
        F.when(F.size(tokens) >= n,
               F.array_distinct(F.transform(idx, shingle)))
         .otherwise(F.array(F.concat_ws(" ", tokens))),
    )


# ---------- deduplication family ----------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash (md5 — portable to the SQL
    oracle). Returns one row per duplicated content."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(df: DataFrame, n_hashes: int = 16) -> DataFrame:
    """Per-row MinHash signature: min over shingles of seeded xxhash64.
    Pure array expressions — zero shuffles, embarrassingly parallel."""
    sigs = [
        F.array_min(F.transform(
            F.col("shingles"), lambda s, k=k: F.xxhash64(s, F.lit(k))))
        for k in range(n_hashes)
    ]
    return df.withColumn("minhash", F.array(*sigs))


def lsh_candidate_pairs(df: DataFrame, id_col: str, n_hashes: int = 16,
                        band_size: int = 4) -> DataFrame:
    """Band the signatures, groupBy band key, emit same-bucket pairs.
    One shuffle on band keys; the join explosion is bounded by bucket
    population (near-dups only), not n^2."""
    n_bands = n_hashes // band_size
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.element_at("minhash", b * band_size + i + 1)
                         for i in range(band_size)]).alias("key"),
        ) for b in range(n_bands)
    ])
    exploded = (df.select(F.col(id_col), "shingles", F.explode(bands).alias("bk"))
                .select(id_col, "shingles", "bk.band", "bk.key"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, on=["band", "key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.shingles").alias("sh_a"), F.col("b.shingles").alias("sh_b"))
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (pairs.withColumn("jaccard", inter / union)
            .select("id_a", "id_b", "jaccard"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard via shingle-explode self-join (the oracle-able
    exact counterpart to LSH). Distinct shingles per doc, so the shared
    count is |A ∩ B|."""
    sized = df.select(id_col, "shingles").withColumn("n_sh", F.size("shingles"))
    ex = sized.select(id_col, "n_sh", F.explode("shingles").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
                 F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("shared"))
        .withColumn("jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


@F.pandas_udf(LongType())  # DataType object: usable before a session exists
def _simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash: md5-derived token hashes, per-bit
    majority vote (numpy bincount over bit planes, no per-row loop)."""
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):  # per-document; token math vectorized
        toks = [t for t in str(text).lower().split(" ") if t]
        if not toks:
            continue
        hs = np.array(
            [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in toks],
            dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        vote = (bits.sum(axis=0) * 2 >= len(toks)).astype(np.uint64)
        out[i] = (vote << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


def simhash_dedup(df: DataFrame, id_col: str, text_col: str = "text",
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidates: identical-simhash groups (hamming 0)
    plus banded buckets for <= max_hamming would follow the LSH pattern;
    here we surface the simhash per doc and the hamming-0 groups."""
    sh = df.select(F.col(id_col), _simhash64(F.col(text_col)).alias("simhash"))
    groups = (sh.groupBy("simhash").agg(F.count("*").alias("n_docs"),
                                        F.min(id_col).alias("keep_id")))
    return groups.filter(F.col("n_docs") > 1)


# ---------- similarity search ----------

def _cosine(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(F.zip_with(vec_col, q, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm_v = F.sqrt(F.aggregate(F.zip_with(vec_col, vec_col, lambda x, y: x * y),
                                F.lit(0.0), lambda acc, x: acc + x))
    qn = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (norm_v * F.lit(qn))


def cosine_topk(df: DataFrame, qvec: list[float], id_col: str = "vec_id",
                vec_col: str = "embedding", k: int = 10) -> DataFrame:
    """Brute-force cosine top-k — the exact baseline. orderBy+limit
    executes as TakeOrdered (per-partition heap + driver merge of k
    rows), not a global sort: it scales linearly."""
    return (
        df.withColumn("cosine", _cosine(F.col(vec_col).cast("array<double>"), qvec))
        .select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ann_lsh_topk(df: DataFrame, qvec: list[float], id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 10, n_planes: int = 8,
                 seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH ANN: sign-bit bucket per row, search only the
    query's bucket (scale path; recall < 1 by construction). Planes are a
    deterministic function of (seed, dim)."""
    dim = len(qvec)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))

    def bucket_expr(vcol):
        bits = []
        for p, plane in enumerate(planes):
            parr = F.array(*[F.lit(float(x)) for x in plane])
            dot = F.aggregate(F.zip_with(vcol, parr, lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        return sum(bits[1:], bits[0])

    qbucket = int(sum((1 << p) for p, plane in enumerate(planes)
                      if float(np.dot(plane, qvec)) >= 0))
    vcol = F.col(vec_col).cast("array<double>")
    return (
        df.withColumn("bucket", bucket_expr(vcol))
        .filter(F.col("bucket") == qbucket)  # partition-prunable at scale
        .withColumn("cosine", _cosine(vcol, qvec))
        .select(id_col, "bucket", "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_top_pairs(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", limit_ids: int = 200,
                        k: int = 20) -> DataFrame:
    """Embedding-cosine near-dup scan over a bounded id range (the exact
    small-scale baseline; the LSH bucket join is the scale path)."""
    sub = (df.filter(F.col(id_col) < limit_ids)
           .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")))
    a, b = sub.alias("a"), sub.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda side: F.sqrt(F.aggregate(  # noqa: E731
        F.zip_with(F.col(f"{side}.v"), F.col(f"{side}.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"),
                (dot / (norm("a") * norm("b"))).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "id_a", "id_b")
        .limit(k)
    )


# ---------- text analysis ----------

def text_quality(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Quality metrics: token count, stopword ratio, mean word length,
    punctuation ratio — all built-in expressions."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit(""))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[^.,;:!?]", ""))
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)), 6)
            .alias("stopword_ratio"),
        F.round(F.when(n_tok > 0,
                       F.length(F.regexp_replace(text_col, " ", "")) / n_tok)
                .otherwise(F.lit(0.0)), 6).alias("avg_word_len"),
        F.round(F.when(F.length(text_col) > 0,
                       n_punct / F.length(text_col)).otherwise(F.lit(0.0)), 6)
            .alias("punct_ratio"),
    )


def lang_guess(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Character-class language heuristic (n-gram-free but deterministic
    and SQL-portable): script detection first, then stopword evidence."""
    return df.select(
        F.col(id_col),
        F.when(F.col(text_col).rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
        .when(F.col(text_col).rlike("[\\u0400-\\u04ff]"), F.lit("ru"))
        .when(F.col(text_col).rlike("(^| )(le|la|les|une|est)( |$)"), F.lit("fr"))
        .when(F.col(text_col).rlike("(^| )(der|die|das|und|ist)( |$)"), F.lit("de"))
        .when(F.col(text_col).rlike("(^| )(el|los|las|una|es)( |$)"), F.lit("es"))
        .when(F.col(text_col).rlike("(^| )(the|a|of|and|is)( |$)"), F.lit("en"))
        .otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (portable); plus a 64-bit prefix as a numeric key."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " "))
    h = F.md5(norm)
    return df.select(
        F.col(id_col), h.alias("fingerprint"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fingerprint60"),
    )
