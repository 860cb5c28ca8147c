"""Luke request handler analogue — index introspection.

Reference: solr/core/src/java/org/apache/solr/handler/admin/
LukeRequestHandler.java (the /admin/luke endpoint): index-level stats
(numDocs, numTerms) and per-field topTerms with their docFreq — the
tool operators use to eyeball an index before querying it.

Both surfaces are one Catalyst aggregate over terms_stats — the
(term, df, ttf) table is already a partial+final hash agg, so the
overview never touches postings rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher


def index_overview(searcher: Searcher) -> DataFrame:
    """One row of index-level stats: (max_doc, n_terms, sum_ttf,
    avgdl) — LukeRequestHandler.getIndexInfo's numDocs/numTerms plus
    the BM25-relevant collection stats."""
    idx = searcher.index
    n_terms = idx.terms_stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    return n_terms.select(
        F.lit(int(idx.stats.max_doc)).cast("long").alias("max_doc"),
        "n_terms",
        F.lit(int(idx.stats.sum_total_term_freq))
        .cast("long")
        .alias("sum_ttf"),
        F.round(
            F.lit(
                float(idx.stats.sum_total_term_freq)
                / float(idx.stats.max_doc)
            ),
            4,
        ).alias("avgdl"),
    )


def top_terms(searcher: Searcher, k: int = 10) -> DataFrame:
    """Luke's topTerms list: the k highest-docFreq terms with df and
    ttf (LukeRequestHandler.getIndexedFieldsInfo builds the same list
    with a PriorityQueue over the terms dict; here it is
    TakeOrderedAndProject over terms_stats)."""
    return (
        searcher.index.terms_stats.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("ttf").cast("long").alias("ttf"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def analyze_document(
    searcher: Searcher, doc_id: int, query: str
) -> DataFrame:
    """DocumentAnalysisRequestHandler analogue (solr/core/.../handler/
    DocumentAnalysisRequestHandler.java, the /analysis/document
    endpoint): the per-stage token stream of one document's text with
    each token flagged when it EQUALS an analyzed query term
    (getQueryTokenSet + the match attribute the handler paints)."""
    from ..analysis.tokenizer import analyze, tokenize_raw

    idx = searcher.index
    qterms = set(analyze(query)[0])
    row = (
        idx.docs.where(F.col("doc_id") == doc_id)
        .select("text")
        .collect()
    )
    rows: list[tuple[str, int, str, bool]] = []
    if row:
        raw = tokenize_raw(row[0]["text"])
        rows += [
            ("tokenize", i, t, t in qterms) for i, t in enumerate(raw)
        ]
        terms, pos = analyze(row[0]["text"])
        rows += [
            ("stop", p, t, t in qterms)
            for t, p in zip(terms, pos)
        ]
    return idx.spark.createDataFrame(
        rows, "stage string, pos long, term string, match boolean"
    )


def analyze_stages(searcher: Searcher, doc_id: int) -> DataFrame:
    """FieldAnalysisRequestHandler analogue (solr/core/src/java/org/
    apache/solr/handler/FieldAnalysisRequestHandler.java, the
    /analysis/field endpoint): the token stream after each stage of
    the analysis chain for one document's text — rows of
    (stage, pos, term) with stage 'tokenize' (StandardTokenizer +
    LowerCaseFilter) then 'stop' (StopFilter, position gaps
    preserved). Single-field debug surface; computed driver-side like
    the handler itself (it analyzes ONE provided value)."""
    from ..analysis.tokenizer import analyze, tokenize_raw

    idx = searcher.index
    row = (
        idx.docs.where(F.col("doc_id") == doc_id)
        .select("text")
        .collect()
    )
    rows: list[tuple[str, int, str]] = []
    if row:
        raw = tokenize_raw(row[0]["text"])
        rows += [("tokenize", i, t) for i, t in enumerate(raw)]
        terms, pos = analyze(row[0]["text"])
        rows += [("stop", p, t) for t, p in zip(terms, pos)]
    return idx.spark.createDataFrame(
        rows, "stage string, pos long, term string"
    )
