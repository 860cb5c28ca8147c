"""XML query syntax — CoreParser analogue.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
xml/CoreParser.java:67-105 (the builder registry) and
xml/builders/*.java. Implemented element subset:

  Scoring queries (``parse_xml_query`` -> Query AST):
    <TermQuery [boost]>raw term</TermQuery>          TermQueryBuilder
    <TermsQuery>analyzed text</TermsQuery>           TermsQueryBuilder
      (each analyzed token becomes a SHOULD TermQuery)
    <MatchAllDocsQuery/>                             MatchAllDocsQueryBuilder
    <BooleanQuery><Clause occurs="must|should|mustNot">
      ...subquery...</Clause>...</BooleanQuery>      BooleanQueryBuilder
    <DisjunctionMaxQuery [tieBreaker]>...</...>      DisjunctionMaxQueryBuilder
    <UserQuery>classic query syntax</UserQuery>      UserInputQueryBuilder
      (routed through search.qparser.parse_lucene)

  Span doc-set queries (``xml_span_doc_ids``):
    <SpanTerm>term</SpanTerm>, <SpanOr>, <SpanNear slopFactor inOrder>,
    <SpanFirst end>, <SpanNot> — SpanQueryBuilderFactory family,
    evaluated constant-score through search.spans / search.surround.

Out of scope (documented): FilteredQuery/ConstantScoreQuery/
CachedFilter (the filter registry — the engine's fq surface covers
that role), LikeThisQuery/FuzzyLikeThisQuery XML forms (the operators
exist natively), NumericRange elements (native range queries cover
them).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame

from ..analysis.tokenizer import analyze
from .executor import Searcher
from .qparser import parse_lucene
from .query import (
    BooleanClause,
    BooleanQuery,
    DisMaxQuery,
    MatchAllQuery,
    Query,
    TermQuery,
)


class XmlQueryError(ValueError):
    pass


def parse_xml_query(xml_str: str) -> Query:
    """Parse an XML query document into the scoring Query AST."""
    return _build(ET.fromstring(xml_str))


def _build(el: ET.Element) -> Query:
    tag = el.tag
    if tag == "TermQuery":
        # TermQueryBuilder: raw term bytes, no analysis
        boost = float(el.get("boost", "1.0"))
        return TermQuery((el.text or "").strip(), boost=boost)
    if tag == "TermsQuery":
        # TermsQueryBuilder: analyze the text; each token is a SHOULD
        # clause of one BooleanQuery
        terms, _ = analyze((el.text or "").strip())
        return BooleanQuery(
            [BooleanClause(TermQuery(t), "SHOULD") for t in terms]
        )
    if tag == "MatchAllDocsQuery":
        return MatchAllQuery()
    if tag == "BooleanQuery":
        clauses = []
        for c in el:
            if c.tag != "Clause":
                raise XmlQueryError(
                    f"BooleanQuery child must be Clause, got {c.tag}"
                )
            occurs = c.get("occurs", "should")
            occur = {
                "must": "MUST",
                "should": "SHOULD",
                "mustnot": "MUST_NOT",
            }.get(occurs.lower())
            if occur is None:
                raise XmlQueryError(f"bad occurs {occurs!r}")
            subs = list(c)
            if len(subs) != 1:
                raise XmlQueryError("Clause needs exactly one subquery")
            clauses.append(BooleanClause(_build(subs[0]), occur))
        return BooleanQuery(clauses)
    if tag == "DisjunctionMaxQuery":
        tie = float(el.get("tieBreaker", "0.0"))
        return DisMaxQuery(tuple(_build(c) for c in el), tie_breaker=tie)
    if tag == "UserQuery":
        return parse_lucene((el.text or "").strip())
    raise XmlQueryError(f"unsupported query element <{tag}>")


def xml_span_doc_ids(searcher: Searcher, xml_str: str) -> DataFrame:
    """Evaluate an XML span-query tree as a constant-score doc set
    (SpanQueryBuilderFactory family) over the span-frame kernel."""
    import pyspark.sql.functions as F

    from .surround import join_span_frames

    def spans(el: ET.Element) -> DataFrame:
        tag = el.tag
        if tag == "SpanTerm":
            term = (el.text or "").strip()
            stats = searcher.index.term_stats([term])
            if term not in stats:
                return searcher.index.spark.createDataFrame(
                    [], "doc_id long, s int, e int"
                )
            return (
                searcher._postings_for([term], want_positions=True)
                .select("doc_id", F.explode("positions").alias("s"))
                .select(
                    "doc_id",
                    F.col("s").cast("int").alias("s"),
                    (F.col("s") + 1).cast("int").alias("e"),
                )
            )
        if tag == "SpanOr":
            out = None
            for c in el:
                f_ = spans(c)
                out = f_ if out is None else out.unionByName(f_)
            if out is None:
                raise XmlQueryError("SpanOr needs children")
            return out.distinct()
        if tag == "SpanNear":
            slop = int(el.get("slopFactor", "0"))
            in_order = el.get("inOrder", "true").lower() == "true"
            frames = [spans(c) for c in el]
            if len(frames) < 2:
                raise XmlQueryError("SpanNear needs >= 2 children")
            return join_span_frames(frames, slop=slop, ordered=in_order)
        if tag == "SpanFirst":
            end = int(el.get("end", "1"))
            subs = list(el)
            if len(subs) != 1:
                raise XmlQueryError("SpanFirst needs one child")
            return spans(subs[0]).where(F.col("e") <= end)
        if tag == "SpanNot":
            subs = list(el)
            if len(subs) != 2:
                raise XmlQueryError("SpanNot needs include + exclude")
            inc, exc = spans(subs[0]), spans(subs[1])
            # a span survives only if NO exclude overlaps it: anti-join
            # against the overlapping pairs (SpanNotQuery.java)
            bad = inc.join(
                exc.select(
                    "doc_id",
                    F.col("s").alias("xs"),
                    F.col("e").alias("xe"),
                ),
                on="doc_id",
                how="inner",
            ).where(
                (F.col("xs") < F.col("e")) & (F.col("xe") > F.col("s"))
            ).select("doc_id", "s", "e")
            return inc.join(bad, ["doc_id", "s", "e"], "left_anti")
        raise XmlQueryError(f"unsupported span element <{el.tag}>")

    root = ET.fromstring(xml_str)
    return spans(root).select("doc_id").distinct()
