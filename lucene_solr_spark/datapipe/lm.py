"""N-gram language-model quality scoring for pretraining pipelines.

Two standard corpus-filtering primitives a 100 TB training-data
pipeline needs, neither present in the reference engine (they are the
data-pipeline layer the survey's §6 brief adds on top of the Lucene
operator set):

  - **Bigram LM perplexity** (CCNet-style, Wenzek et al. 2020): train
    add-alpha-smoothed unigram/bigram counts on the corpus itself (or a
    held-out reference slice), score each document by per-token
    log-perplexity, and drop the most-perplexing tail. The classic
    KenLM filter re-expressed as two Spark aggregations and one join.
  - **DSIR importance weights** (Xie et al. 2023): hashed-unigram
    importance sampling — weight(doc) = sum over tokens of
    log(p_target(bucket) / p_source(bucket)) over md5 hash buckets,
    where target is a quality-selected subset and source the full
    corpus. Selects source documents that "look like" the target
    distribution.

Spark shape (both): tokenization is a single JVM-side
``regexp_extract_all`` (no Python in the hot path); counts are
groupBy aggregations with map-side partial combine; scoring joins the
token stream against the model on the n-gram key. The model tables are
DataFrames — at 10^12-turn scale they stay distributed (shuffle join
on the gram key, skew-safe because gram frequency caps at corpus
frequency); at small scale AQE broadcasts them automatically. Scoring
is one explode + one join + one groupBy — no driver collection at any
size.

Determinism: smoothing arithmetic is fixed-literal double math, the
same operator order the DuckDB oracle twin uses; md5 bucketing is the
repo-standard replayable hash (never ``rand()``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

TOKEN_SQL_PATTERN = "[a-z0-9_]+"


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, pos, term) token stream, pure Catalyst."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}', 0)"
    )
    return df.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int, int]:
    """Count model: returns (unigrams, bigrams, vocab_size, total_tokens).

    unigrams: (term, c1); bigrams: (w1, w2, c2). Two aggregations over
    one token pass; the bigram frame derives from the same scan via a
    self-join-free array shift (transform over sequence), so the text
    is read once per aggregate with full map-side combine.
    """
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}', 0)"
    )
    base = df.select(toks.alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        base.select(
            F.explode(
                # sequence(a, b) counts DOWN when b < a, so guard
                # 0/1-token docs explicitly
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i-1] AS w1, toks[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    # persist the model frames: scoring joins uni twice (first-token
    # and backoff denominators) and bi once — without a cache each
    # reference re-runs the full corpus tokenize+aggregate subtree
    uni = uni.persist()
    bi = bi.persist()
    stats = uni.agg(
        F.count(F.lit(1)).alias("v"),
        F.coalesce(F.sum("c1"), F.lit(0)).alias("t"),
    ).collect()[0]
    return uni, bi, int(stats["v"]), int(stats["t"])


def score_perplexity(
    df: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    total_tokens: int,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document bigram log-perplexity under the add-alpha model.

    p(w_1) = (c1(w_1) + a) / (T + a*V);
    p(w_i | w_{i-1}) = (c2(w_{i-1}, w_i) + a) / (c1(w_{i-1}) + a*V).
    logppl(doc) = -(sum log p) / N.  Unseen grams fall back to the
    smoothing mass via left joins (coalesce to 0 counts).

    Returns (doc_id, n_tokens, logppl). One explode, two joins on the
    gram keys, one groupBy — all shuffle keys are corpus-bounded.
    """
    a = float(alpha)
    av = a * vocab_size
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}', 0)"
    )
    base = df.select("doc_id", toks.alias("toks")).where(
        F.size("toks") > 0
    )
    first = (
        # get() not [0]: ANSI mode may evaluate the projection before
        # the size()>0 filter in the collapsed plan
        base.select("doc_id", F.get(F.col("toks"), 0).alias("term"))
        .join(uni, "term", "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(a))
                / F.lit(float(total_tokens) + av)
            ).alias("lp"),
        )
    )
    # bigrams from the SAME array via an index shift — no positional
    # self-join; the only shuffles left are the two model joins and the
    # final per-doc aggregate
    rest = (
        base.select(
            "doc_id",
            F.explode(
                # sequence(a, b) counts DOWN when b < a, so guard
                # 0/1-token docs explicitly
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i-1] AS w1, toks[i] AS w2)) "
                    "ELSE array() END"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .join(bi, ["w1", "w2"], "left")
        .join(
            uni.select(F.col("term").alias("w1"), "c1"), "w1", "left"
        )
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(a))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(av))
            ).alias("lp"),
        )
    )
    return (
        first.unionByName(rest)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("lp") / F.count(F.lit(1))).alias("logppl"),
        )
    )


def dsir_importance_weights(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR hashed-unigram importance weight per source document:
    w(doc) = sum_tokens log(p_target(b) / p_source(b)), b =
    md5-bucket(term) mod num_buckets. Both distributions are
    add-alpha smoothed over the bucket space so unseen buckets stay
    finite. Returns (doc_id, n_tokens, logweight).

    The bucket tables are num_buckets rows — broadcast-sized at any
    corpus scale (the whole point of the hashing trick: model size is
    fixed while the corpus grows), so the scoring join is a broadcast
    hash join with zero shuffle on the big side beyond the final
    per-doc groupBy.
    """
    a = float(alpha)

    def bucket(col):
        return (
            F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
            % num_buckets
        ).alias("bucket")

    def dist(df: DataFrame):
        toks = _tokens(df, text_col)
        cnt = toks.groupBy(bucket(F.col("term"))).agg(
            F.count(F.lit(1)).alias("c")
        )
        total = int(
            cnt.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0]
        )
        return cnt, total

    src_cnt, src_total = dist(source)
    tgt_cnt, tgt_total = dist(target)
    av = a * num_buckets
    ratio = (
        src_cnt.withColumnRenamed("c", "cs")
        .join(tgt_cnt.withColumnRenamed("c", "ct"), "bucket", "outer")
        .select(
            "bucket",
            F.log(
                (
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(a))
                    / F.lit(tgt_total + av)
                )
                / (
                    (F.coalesce(F.col("cs"), F.lit(0)) + F.lit(a))
                    / F.lit(src_total + av)
                )
            ).alias("lr"),
        )
    )
    toks = _tokens(source, text_col).select(
        "doc_id", bucket(F.col("term"))
    )
    return (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr").alias("logweight"),
        )
    )


def pmi_collocations(
    uni: DataFrame,
    bi: DataFrame,
    total_tokens: int,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over the
    trained count model (Church & Hanks 1990 — the phrase-mining step
    of tokenizer/vocab construction):

      pmi(w1, w2) = ln( (c2/T2) / ((c1(w1)/T) * (c1(w2)/T)) )

    with a min bigram count to suppress rare-pair noise.  Two joins of
    the bigram frame against the unigram frame (both model-sized, not
    corpus-sized) and one top-k.
    """
    t2_row = bi.agg(
        F.coalesce(F.sum("c2"), F.lit(0)).alias("t2")
    ).collect()[0]
    t2 = int(t2_row["t2"])
    t = float(total_tokens)
    return (
        bi.where(F.col("c2") >= min_count)
        .join(
            uni.select(
                F.col("term").alias("w1"), F.col("c1").alias("ca")
            ),
            "w1",
        )
        .join(
            uni.select(
                F.col("term").alias("w2"), F.col("c1").alias("cb")
            ),
            "w2",
        )
        .select(
            "w1",
            "w2",
            "c2",
            F.log(
                (F.col("c2") / F.lit(float(t2)))
                / ((F.col("ca") / F.lit(t)) * (F.col("cb") / F.lit(t)))
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction by tf-idf (the classic
    Salton weighting): score = tf * ln(N / df), top_k terms per doc
    (ties: term asc).  One token explode, one (doc, term) aggregate,
    one df aggregate joined back, one per-doc window top-k — the same
    shuffle shape as the index build itself, so it scales wherever
    the index does.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    toks = _tokens(df, text_col)
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf")
            * F.log(F.lit(float(n_docs)) / F.col("df"))
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "rank", "term", "score")
    )


def train_trigram_lm(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int, int]:
    """(uni, bi, tri, vocab_size, total_tokens): the bigram model of
    :func:`train_bigram_lm` plus trigram counts (w1, w2, w3, c3) from
    the same single-scan array-shift projection."""
    uni, bi, v, t = train_bigram_lm(df, text_col)
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}', 0)"
    )
    tri = (
        df.select(toks.alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 3 THEN "
                    "transform(sequence(1, size(toks) - 2), "
                    "i -> struct(toks[i-1] AS w1, toks[i] AS w2, "
                    "toks[i+1] AS w3)) "
                    "ELSE array() END"
                )
            ).alias("tg")
        )
        .select("tg.w1", "tg.w2", "tg.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
        .persist()
    )
    return uni, bi, tri, v, t


def score_stupid_backoff(
    df: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document mean log stupid-backoff score (Brants et al. 2007,
    "Large Language Models in Machine Translation" — the web-scale LM
    score that skips normalization):

      S(w3 | w1 w2) = c3/c2(w1,w2)            if c3 > 0
                    = a * c2(w2,w3)/c1(w2)    elif that count > 0
                    = a^2 * c1(w3)/T          elif c1(w3) > 0
                    = a^2 * 1/T               otherwise (floor)

    Scores trigram positions only (docs with < 3 tokens are excluded).
    Returns (doc_id, n_scored, logscore).  Same join shape as
    :func:`score_perplexity` with one extra (small) trigram join.
    """
    a = float(alpha)
    t = float(total_tokens)
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}', 0)"
    )
    trips = (
        df.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2), "
                    "i -> struct(toks[i-1] AS w1, toks[i] AS w2, "
                    "toks[i+1] AS w3))"
                )
            ).alias("tg"),
        )
        .select("doc_id", "tg.w1", "tg.w2", "tg.w3")
    )
    c2_ctx = bi.select(
        F.col("w1"), F.col("w2"), F.col("c2").alias("c2_ctx")
    )
    c2_hi = bi.select(
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        F.col("c2").alias("c2_hi"),
    )
    c1_mid = uni.select(
        F.col("term").alias("w2"), F.col("c1").alias("c1_mid")
    )
    c1_last = uni.select(
        F.col("term").alias("w3"), F.col("c1").alias("c1_last")
    )
    scored = (
        trips.join(tri, ["w1", "w2", "w3"], "left")
        .join(c2_ctx, ["w1", "w2"], "left")
        .join(c2_hi, ["w2", "w3"], "left")
        .join(c1_mid, "w2", "left")
        .join(c1_last, "w3", "left")
        .select(
            "doc_id",
            F.log(
                F.when(
                    F.col("c3").isNotNull(),
                    F.col("c3") / F.col("c2_ctx"),
                )
                .when(
                    F.col("c2_hi").isNotNull(),
                    F.lit(a) * F.col("c2_hi") / F.col("c1_mid"),
                )
                .when(
                    F.col("c1_last").isNotNull(),
                    F.lit(a * a) * F.col("c1_last") / F.lit(t),
                )
                .otherwise(F.lit(a * a) / F.lit(t))
            ).alias("ls"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        (F.sum("ls") / F.count(F.lit(1))).alias("logscore"),
    )
