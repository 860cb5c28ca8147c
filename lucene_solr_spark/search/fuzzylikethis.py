"""FuzzyLikeThisQuery — fuzzy MLT-style disjunction (ignoreTF mode).

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java:
  - addTerms (:191-251): analyze the query string; for each DISTINCT
    source token enumerate index-term variants via SlowFuzzyTermsEnum —
    accept when similarity > minSimilarity, where (prefixLength=0)
    ``similarity = 1 - editDistance / min(len(source), len(variant))``
    (SlowFuzzyTermsEnum.java:234) and the enum reports
    ``boost = (similarity - minSimilarity) / (1 - minSimilarity)``
    (:113-115, scale_factor). Keep the best MAX_VARIANTS_PER_TERM=50
    variants per source term (:67,203).
  - score reset (:239-243): ``st.score = boost^2 * idf(df, numDocs)``
    with DefaultSimilarity ``idf = ln(numDocs/(df+1)) + 1``; df is the
    SOURCE term's docFreq, or the integer average of the variants'
    docFreqs when the source term itself is absent (:230-235). A global
    queue keeps the overall top ``maxNumTerms`` (:112-118).
  - rewrite (:253-318, ignoreTF=true): each variant becomes a
    ConstantScoreQuery(TermQuery) boosted by st.score, OR-ed with coord
    disabled — a matching doc scores the SUM of its matched variants'
    boosts, independent of tf.

Spark shape: variant enumeration is one levenshtein-filtered pass over
the terms dictionary (the same bounded-rewrite path Prefix/Fuzzy use);
weights are computed driver-side in float64 (mirroring Lucene's
driver-side rewrite) and folded into a literal map over ONE postings
scan — no per-variant jobs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis.tokenizer import analyze
from .executor import Searcher

MAX_VARIANTS_PER_TERM = 50  # FuzzyLikeThisQuery.java:67


def _variants(
    searcher: Searcher,
    source: str,
    min_similarity: float,
    prefix_length: int = 0,
) -> list[tuple[str, int, float]]:
    """(variant_term, df, enum_boost) accepted by the slow fuzzy enum."""
    ts = searcher.index.terms_stats
    pre = source[:prefix_length]
    body = ts
    if pre:
        body = body.where(F.col("term").startswith(pre))
    src_rest = source[prefix_length:]
    n = len(src_rest)
    sim_expr = 1.0 - (
        F.levenshtein(
            F.expr(f"substr(term, {prefix_length + 1})"),
            F.lit(src_rest),
        ).cast("double")
        / (
            F.lit(float(prefix_length))
            + F.least(
                F.lit(float(n)),
                (F.length("term") - F.lit(prefix_length)).cast("double"),
            )
        )
    )
    # per-term variant cap runs IN THE PLAN (ScoreTermQueue top-50 →
    # TakeOrderedAndProject): the driver never collects more than the
    # cap even against a 10^8-term dictionary
    rows = (
        body.select("term", "df", sim_expr.alias("sim"))
        .where(F.col("sim") > F.lit(float(min_similarity)))
        .orderBy(F.desc("sim"), F.asc("term"))
        .limit(MAX_VARIANTS_PER_TERM)
        .collect()
    )
    scale = 1.0 / (1.0 - min_similarity)
    return [
        (r["term"], int(r["df"]), (float(r["sim"]) - min_similarity) * scale)
        for r in rows
    ]


def fuzzy_like_this(
    searcher: Searcher,
    query_string: str,
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    max_num_terms: int = 100,
    k: int = 10,
) -> DataFrame:
    """Top-k docs for FuzzyLikeThisQuery(maxNumTerms) over the text
    field, ignoreTF mode — score = Σ matched-variant boosts,
    tie-broken (score desc, doc_id asc)."""
    index = searcher.index
    num_docs = index.stats.max_doc
    seen: set[str] = set()
    scored_terms: list[tuple[str, float]] = []
    terms, _ = analyze(query_string)
    for source in terms:
        if source in seen:  # processedTerms (:200-202)
            continue
        seen.add(source)
        var = _variants(searcher, source, min_similarity, prefix_length)
        if not var:
            continue
        src_df = next((d for t, d, _ in var if t == source), 0)
        if src_df == 0:
            src_df = sum(d for _, d, _ in var) // len(var)  # int avg df
        idf = math.log(num_docs / (src_df + 1.0)) + 1.0
        for t, _, boost in var:
            scored_terms.append((t, boost * boost * idf))
    # global top maxNumTerms by score (:112-118); stable by term
    scored_terms.sort(key=lambda t: (-t[1], t[0]))
    scored_terms = scored_terms[:max_num_terms]
    if not scored_terms:
        return index.spark.createDataFrame([], "doc_id long, score double")
    # a term reachable from several source tokens is several SHOULD
    # clauses (rewrite :273-310) — a matching doc sums every boost
    merged: dict[str, float] = {}
    for t, w in scored_terms:
        merged[t] = merged.get(t, 0.0) + w
    scored_terms = sorted(merged.items())
    wmap = F.create_map(
        *[x for t, w in scored_terms for x in (F.lit(t), F.lit(w))]
    )
    postings = searcher._postings_for([t for t, _ in scored_terms])
    return (
        postings.select("doc_id", "term")
        .distinct()
        .select("doc_id", wmap[F.col("term")].alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
