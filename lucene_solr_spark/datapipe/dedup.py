"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (shuffle-aware, no UDFs):

  - exact: md5(text) hash-groupBy — one shuffle on the hash
  - minhash LSH: token shingles -> H minhashes -> bands -> bucket
    self-join. The band bucket join is the classic sub-quadratic
    near-dup path: candidates only where a band collides.
  - simhash: 32-bit sign-aggregated token-hash fingerprint
  - n-gram jaccard: exact verify step over LSH candidates (never the
    full cross product)

Hashing uses md5-derived 60-bit ints (spark_text.hash60) so the DuckDB
oracle can reproduce results bit-for-bit; at production scale you'd swap
xxhash64 in one place.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.spark_text import analyzed_tokens, hash60, token_shingles


def distinct_shingle_rows(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3,
) -> "DataFrame":
    """(doc_id, shingle) distinct rows via a COLUMN-vectorized Arrow
    kernel: one pandas `.str.findall` per batch (C regex loop), one
    vectorized stopword `isin`, n-gram assembly as shifted-array string
    concat, distinct via frame-level drop_duplicates — no per-document
    Python. Output identical to analyzer-per-doc shingling (same
    grammar, same ' '-joined post-stop word n-grams). At 100 TB this
    kernel is the dedup hot loop; the previous per-doc analyze() loop
    was its bottleneck."""
    import numpy as np
    import pandas as pd

    from ..analysis.tokenizer import (
        ENGLISH_STOP_WORDS,
        MAX_TOKEN_LENGTH,
        TOKEN_PATTERN,
    )

    stop_list = sorted(ENGLISH_STOP_WORDS)
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "shingle": pd.Series([], dtype="object"),
        }
    )

    def run(batches):
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str)
            toklists = texts.str.lower().str.findall(TOKEN_PATTERN)
            lens = toklists.str.len().to_numpy(dtype=np.int64)
            if int(lens.sum()) < shingle_n:
                yield empty
                continue
            flat = pd.Series(
                np.concatenate(
                    [np.asarray(t, dtype=object) for t in toklists if t]
                ),
                dtype=object,
            )
            docs = np.repeat(pdf[id_col].to_numpy(dtype=np.int64), lens)
            keep = (
                ~flat.isin(stop_list).to_numpy()
                & (flat.str.len() <= MAX_TOKEN_LENGTH).to_numpy()
            )
            tok = flat.to_numpy()[keep]
            docs = docs[keep]
            n = len(tok)
            if n < shingle_n:
                yield empty
                continue
            m = n - shingle_n + 1
            d0 = docs[:m]
            same = np.ones(m, dtype=bool)
            for j in range(1, shingle_n):
                same &= docs[j : m + j] == d0
            head = pd.Series(tok[:m], dtype="object")
            sh = head.str.cat(
                [pd.Series(tok[j : m + j], dtype="object")
                 for j in range(1, shingle_n)],
                sep=" ",
            ).to_numpy()
            out = pd.DataFrame(
                {"doc_id": d0[same], "shingle": sh[same]}
            ).drop_duplicates()
            out["doc_id"] = out["doc_id"].astype("int64")
            yield out

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, "doc_id long, shingle string"
    )

# Production LSH parameters: 128 permutations in 16 bands of 8 — the
# standard near-dup recall/precision operating point (s-curve threshold
# (1/16)^(1/8) ~= 0.71 Jaccard), vs the toy 12/3 of round 1.
DEFAULT_NUM_HASHES = 128
DEFAULT_BAND_SIZE = 8

# Buckets larger than this (boilerplate mega-buckets) switch from
# all-pairs to star linking — see minhash_candidate_pairs.
DEFAULT_BUCKET_CAP = 1000


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_dups, min_doc_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_doc_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}): per-seed min over shingle hashes.
    Docs with no shingles (fewer than n tokens) are dropped."""
    base = distinct_shingle_rows(df, text_col, id_col, shingle_n)
    # affine double hashing (Kirsch-Mitzenmacher): ONE md5 per shingle
    # yields (a, b); permutation i = (a + i*b) & (2^60-1). 128x fewer
    # hash evaluations than per-seed md5, same LSH guarantees; the
    # DuckDB oracle mirrors the arithmetic verbatim. b is masked to 55
    # bits so a + 127*b stays inside int64 (DuckDB errors on BIGINT
    # overflow; Java would silently wrap and diverge).
    md5c = F.md5(F.col("shingle"))
    a = F.conv(F.substring(md5c, 1, 15), 16, 10).cast("long")
    b = (
        F.conv(F.substring(md5c, 16, 15), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit((1 << 55) - 1))
        .bitwiseOR(F.lit(1))
    )
    hashed = base.select(
        "doc_id", a.alias("ha"), b.alias("hb")
    )
    mask = F.lit((1 << 60) - 1)
    aggs = [
        F.min(
            (F.col("ha") + F.lit(i) * F.col("hb")).bitwiseAND(mask)
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_band_buckets(
    sigs: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """(band, bucket, doc_id): bucket = md5 of the band's minhashes."""
    n_bands = num_hashes // band_size
    parts = []
    for b in range(n_bands):
        cols = [
            F.col(f"mh_{i}").cast("string")
            for i in range(b * band_size, (b + 1) * band_size)
        ]
        parts.append(
            sigs.select(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("bucket"),
                "doc_id",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    shingle_n: int = 3,
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing >= 1 LSH band bucket.
    The self-join is per (band, bucket) — bounded by bucket sizes, never
    the full cross product.

    Mega-bucket guard: a bucket with n > ``bucket_cap`` members (one
    boilerplate text shared by 10^7 docs) would emit O(n^2) pairs and
    straggle one reducer. Such buckets switch to STAR linking — every
    member pairs with the bucket's min doc_id only (O(n) pairs). For
    dedup the star preserves the connected components (all members
    remain transitively linked through the representative), which is
    the property dedup-by-clustering consumes; only the explicit
    pair list is thinned."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    buckets = minhash_band_buckets(sigs, num_hashes, band_size)
    # the self-join references the bucket table twice; without a
    # materialization Spark recomputes the tokenize+shingle+minhash
    # lineage for both sides (no exchange to reuse above a mapInPandas)
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    buckets = buckets.withColumn(
        "sz", F.count(F.lit(1)).over(w)
    ).withColumn("rep", F.min("doc_id").over(w))
    buckets = buckets.persist()
    small = buckets.where(F.col("sz") <= F.lit(bucket_cap))
    left = small.alias("l")
    right = small.alias("r")
    all_pairs = left.join(
        right,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(
        F.col("l.doc_id").alias("doc_a"),
        F.col("r.doc_id").alias("doc_b"),
    )
    star_pairs = (
        buckets.where(
            (F.col("sz") > F.lit(bucket_cap))
            & (F.col("doc_id") != F.col("rep"))
        )
        .select(
            F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
    )
    return all_pairs.unionByName(star_pairs).distinct()


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for the given candidate pairs:
    (doc_a, doc_b, jaccard). Computed via exploded shingle join +
    distinct-set sizes (no arrays collected to the driver)."""
    sh = distinct_shingle_rows(df, text_col, id_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id")
        )
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(doc_id, simhash): sign-aggregated token-hash fingerprint with tf
    weighting. bit b set iff sum over tokens of tf * (bit(h,b) ? 1 : -1)
    > 0."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(analyzed_tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn("h", hash60(F.col("term")))
    aggs = []
    for b in range(bits):
        contrib = F.when(
            F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
            F.col("tf"),
        ).otherwise(-F.col("tf"))
        aggs.append(F.sum(contrib).alias(f"s_{b}"))
    sums = h.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"s_{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    block_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance <= max_hamming.
    Blocking: pairs must share at least one of the 4 byte-blocks
    (pigeonhole: distance <=3 over 4 blocks guarantees a shared block),
    keeping the self-join sub-quadratic."""
    sh = simhash(df, text_col, id_col, bits)
    n_blocks = bits // block_bits
    parts = []
    for blk in range(n_blocks):
        parts.append(
            sh.select(
                "doc_id",
                "simhash",
                F.lit(blk).alias("blk"),
                F.shiftright(F.col("simhash"), blk * block_bits)
                .bitwiseAND(F.lit((1 << block_bits) - 1))
                .alias("blk_val"),
            )
        )
    blocked = parts[0]
    for p in parts[1:]:
        blocked = blocked.unionByName(p)
    l, r = blocked.alias("l"), blocked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.blk_val") == F.col("r.blk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(
            F.col("ha").bitwiseXOR(F.col("hb"))
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)
