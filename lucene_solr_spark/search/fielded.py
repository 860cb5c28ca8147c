"""Fielded search: per-field BM25 composed DisMax-style (edismax qf/pf).

Reference semantics (solr/core/src/java/org/apache/solr/search/
DisMaxQParser.java:140-180 and ExtendedDismaxQParser): the main query
turns each user term into a DisjunctionMaxQuery over the qf fields
(``qf=title^2 body`` -> dismax(title:t^2, body:t)), the per-term dismax
scores are summed Boolean-SHOULD style with a minimum-match, and pf
(phrase fields) add a phrase-proximity boost for documents where the
whole query matches as a phrase in the pf field
(DisMaxQParser.addBoostQuery / ExtendedDismaxQParser pf handling).

Spark shape: ONE union of per-(field, term) scored postings ->
groupBy(doc_id, term) dismax -> groupBy(doc_id) sum. Two shuffles
total regardless of the number of fields or terms; the per-field
postings scans are field-pruned pushed-down predicates over the single
fielded postings table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..index.fields import FieldedIndex
from .executor import Searcher
from .query import PhraseQuery


def parse_qf(qf: str) -> dict[str, float]:
    """Parse a Solr qf/pf spec string — 'title^2 body' ->
    {'title': 2.0, 'body': 1.0} (SolrPluginUtils.parseFieldBoosts,
    solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java)."""
    out: dict[str, float] = {}
    for part in qf.split():
        if "^" in part:
            name, boost = part.split("^", 1)
            out[name] = float(boost)
        else:
            out[part] = 1.0
    if not out:
        raise ValueError("empty qf spec")
    return out


class FieldedSearcher:
    """Per-field Searchers over one FieldedIndex (PerFieldSimilarity
    analogue) plus the edismax main-query composition."""

    def __init__(self, index: FieldedIndex, exact_float32: bool = False):
        self.index = index
        self.exact = exact_float32
        self.searchers = {
            f: Searcher(index.field_view(f), exact_float32)
            for f in index.fields
        }

    @property
    def _score_type(self) -> str:
        return "float" if self.exact else "double"

    def field_searcher(self, field: str) -> Searcher:
        return self.searchers[field]

    def score_edismax(
        self,
        terms: list[str],
        qf: dict[str, float],
        tie: float = 0.0,
        pf: dict[str, float] | None = None,
        pf_slop: int = 0,
        mm: int = 1,
    ) -> DataFrame:
        """All matching docs for the edismax main query:
        sum over terms of dismax over fields, msm >= mm, plus optional
        pf phrase boosts added to already-matching docs.

        A repeated user term builds one SHOULD clause per occurrence in
        edismax, so a duplicate scores (and counts toward mm) once per
        occurrence: the distinct-term dismax score is weighted by the
        term's clause multiplicity and n_terms sums multiplicities."""
        from collections import Counter

        mult = Counter(terms)
        all_terms = sorted(mult)
        parts: list[DataFrame] = []
        for field, boost in qf.items():
            s = self.searchers[field]
            ts = s.index.term_stats(all_terms)
            scored = s._score_terms(
                [(t, float(boost)) for t in all_terms], ts
            )
            parts.append(scored.select("doc_id", "term", "score"))
        unioned = parts[0]
        for p in parts[1:]:
            unioned = unioned.unionByName(p)
        per_term = unioned.groupBy("doc_id", "term").agg(
            (
                F.max("score")
                + F.lit(float(tie)) * (F.sum("score") - F.max("score"))
            ).alias("score")
        )
        mmap = F.create_map(
            *[
                x
                for t in all_terms
                for x in (F.lit(t), F.lit(float(mult[t])))
            ]
        )
        agg = per_term.groupBy("doc_id").agg(
            F.sum(F.col("score") * mmap[F.col("term")])
            .cast(self._score_type)
            .alias("score"),
            F.sum(mmap[F.col("term")]).cast("long").alias("n_terms"),
        )
        out = agg.where(F.col("n_terms") >= F.lit(int(mm))).select(
            "doc_id", "score"
        )
        if pf:
            boosts = None
            for field, boost in pf.items():
                s = self.searchers[field]
                ph = s.score(
                    PhraseQuery(list(terms), slop=pf_slop, boost=float(boost))
                ).select("doc_id", F.col("score").alias("pf_score"))
                boosts = (
                    ph
                    if boosts is None
                    else boosts.unionByName(ph)
                )
            pf_agg = boosts.groupBy("doc_id").agg(
                F.sum("pf_score").alias("pf_score")
            )
            out = (
                out.join(pf_agg, "doc_id", "left")
                .select(
                    "doc_id",
                    (
                        F.col("score")
                        + F.coalesce(F.col("pf_score"), F.lit(0.0))
                    )
                    .cast(self._score_type)
                    .alias("score"),
                )
            )
        return out

    def search_edismax(
        self,
        terms: list[str],
        qf: dict[str, float],
        tie: float = 0.0,
        pf: dict[str, float] | None = None,
        pf_slop: int = 0,
        mm: int = 1,
        k: int = 10,
    ) -> DataFrame:
        scored = self.score_edismax(terms, qf, tie, pf, pf_slop, mm)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
