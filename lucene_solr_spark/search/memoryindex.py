"""MemoryIndex — single-document in-memory index for percolation.

Reference: lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java: index ONE document in RAM, run any query against it,
get a relevance score — the classic "percolator" primitive (match a
stream of documents against stored queries, e.g. alerting).

Pure Python by design (no Spark session): the per-document cost must be
microseconds because the scale shape is *documents x queries* — the
distributed form is a mapInPandas over the document stream applying a
broadcast list of compiled queries (see ``percolate``).

Scoring follows the engine's BM25 with single-doc collection stats,
N = maxDoc = 1, avgdl = dl (MemoryIndex.search uses the normal
IndexSearcher over the 1-doc reader), including the norm-byte
quantization so a MemoryIndex score equals the engine's score for the
same text in a 1-doc corpus.
"""

from __future__ import annotations

import math

import numpy as np

from ..analysis.tokenizer import analyze
from ..index.norms import NORM_TABLE, encode_norm
from .query import (
    BooleanQuery,
    DisMaxQuery,
    MatchAllQuery,
    PhraseQuery,
    Query,
    TermQuery,
    rewrite,
)


class MemoryIndex:
    def __init__(self, text: str, analyzer=None):
        terms, positions = (analyzer or analyze)(text or "")
        self.dl = len(terms)
        self.postings: dict[str, list[int]] = {}
        for t, p in zip(terms, positions):
            self.postings.setdefault(t, []).append(p)
        nb = int(encode_norm(np.array([max(self.dl, 1)]))[0])
        self.norm_byte = nb

    # -- stats: N=1 single-doc collection --------------------------------

    def _idf(self, term: str) -> float:
        df = 1 if term in self.postings else 0
        return math.log(1 + (1 - df + 0.5) / (df + 0.5))

    def _bm25(self, tf: float, weight: float) -> float:
        if tf <= 0:
            return 0.0
        avgdl = float(self.dl) if self.dl else 1.0
        qdl = float(NORM_TABLE[self.norm_byte])
        denom_add = 1.2 * ((1 - 0.75) + 0.75 * qdl / avgdl)
        return weight * tf / (tf + denom_add)

    # -- query evaluation -------------------------------------------------

    def score(self, q: Query) -> float:
        """BM25 score of the one document for ``q`` (0.0 = no match)."""
        return self._score(rewrite(q))

    def matches(self, q: Query) -> bool:
        return self.score(q) > 0.0 or isinstance(
            rewrite(q), MatchAllQuery
        )

    def _score(self, q: Query) -> float:
        if isinstance(q, TermQuery):
            plist = self.postings.get(q.term)
            if not plist:
                return 0.0
            w = q.boost * self._idf(q.term) * (1.2 + 1)
            return self._bm25(float(len(plist)), w)
        if isinstance(q, MatchAllQuery):
            return 1.0
        if isinstance(q, PhraseQuery):
            return self._score_phrase(q)
        if isinstance(q, DisMaxQuery):
            scores = [self._score(s) for s in q.queries]
            if not any(s > 0 for s in scores):
                return 0.0
            m = max(scores)
            return m + q.tie_breaker * (sum(scores) - m)
        if isinstance(q, BooleanQuery):
            must = [c.query for c in q.clauses if c.occur == "MUST"]
            should = [c.query for c in q.clauses if c.occur == "SHOULD"]
            must_not = [
                c.query for c in q.clauses if c.occur == "MUST_NOT"
            ]
            if any(self._score(s) > 0 for s in must_not):
                return 0.0
            m_scores = [self._score(s) for s in must]
            if any(s <= 0 for s in m_scores):
                return 0.0
            s_scores = [self._score(s) for s in should]
            n_matched = sum(1 for s in s_scores if s > 0)
            msm = q.min_should_match
            if not must:
                msm = max(1, msm)
            if n_matched < msm:
                return 0.0
            return sum(m_scores) + sum(s for s in s_scores if s > 0)
        raise TypeError(f"MemoryIndex: unsupported query {q!r}")

    def _score_phrase(self, q: PhraseQuery) -> float:
        from .sloppy import sloppy_freq

        plists = []
        for i, t in enumerate(q.terms):
            pl = self.postings.get(t)
            if not pl:
                return 0.0
            plists.append(np.asarray(pl, dtype=np.int64) - i)
        if q.slop == 0:
            common = set(plists[0].tolist())
            for arr in plists[1:]:
                common &= set(arr.tolist())
            tf = float(len(common))
        else:
            tf = sloppy_freq(plists, q.slop)
        if tf <= 0:
            return 0.0
        w32 = 0.0
        for t in q.terms:
            w32 += self._idf(t)
        return self._bm25(tf, q.boost * w32 * (1.2 + 1))


def percolate(queries: list[tuple[str, Query]]):
    """mapInPandas kernel factory: documents stream through a broadcast
    list of (name, compiled query); emits (doc_id, query_name) for each
    match — the distributed percolator (documents x queries at scale;
    each Arrow batch builds per-doc MemoryIndexes once and probes every
    query against them)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out_doc, out_q = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mi = MemoryIndex(text if isinstance(text, str) else "")
                for name, q in queries:
                    if mi.matches(q):
                        out_doc.append(doc_id)
                        out_q.append(name)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "query_name": pd.Series(out_q, dtype="object"),
                }
            )

    return run
