"""Span queries — position-aware doc-set operators (SURVEY.md §2.9).

References (lucene/core/src/java/org/apache/lucene/search/spans/):
  - SpanNearQuery.java + NearSpansOrdered.java: clause spans in document
    order, non-overlapping, with total in-between distance <= slop. For
    term spans (length 1) over positions p_0 < p_1 < ... < p_{n-1} the
    ordered match condition is (p_{n-1} - p_0) - (n - 1) <= slop.
  - NearSpansUnordered.java: any order; slop check is
    (max_end - min_start) - totalLength <= slop, i.e. for two term
    spans |p_a - p_b| - 1 <= slop.
  - SpanOrQuery.java: union of clause spans.
  - SpanNotQuery.java: spans of `include` that do not overlap any span
    of `exclude` — for term spans, include-positions not equal to any
    exclude-position (term spans have length 1).
  - SpanFirstQuery.java: spans ending within the first `end` positions
    (gated separately as span_first).

The engine exposes these as CONSTANT-SCORE doc sets (the same shape the
span_first gate uses): the positional existence test is the interesting
operator; BM25 scoring of span freq composes via the ordinary scorer
once freq is defined.

Scale shape: each clause is one pruned postings lookup (bucket + term
pruning on the segment store); positions explode per occurrence and the
clause streams meet in ONE doc_id-keyed shuffle (groupBy or join chain).
At 10^12 docs the join keys are (doc_id), the same distribution the
postings already have — no skew beyond the terms' own df.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher


def _positions(searcher: Searcher, term: str, alias: str) -> DataFrame:
    return (
        searcher._postings_for([term], want_positions=True)
        .select("doc_id", F.explode("positions").alias(alias))
    )


def span_near(
    searcher: Searcher,
    terms: list[str],
    slop: int,
    in_order: bool = True,
) -> DataFrame:
    """Docs containing a SpanNear match of ``terms`` — distinct doc_id.

    Ordered (NearSpansOrdered): positions strictly increasing in clause
    order with (p_last - p_first) - (n-1) <= slop.
    Unordered (NearSpansUnordered, any N clauses, repeats allowed): a
    one-position-per-clause window with (max - min + 1) - n <= slop
    (matchLength = maxEnd - minStart vs totalLength = n for length-1
    term spans). Clauses sharing a term must occupy DISTINCT positions
    — the SpansCell overlap resolution of
    NearSpansUnordered.java:157-176; enforced here by joining a
    repeated term's position list once per clause with strictly
    ascending positions (an assignment of m distinct positions exists
    iff the ascending one does, and the window width is permutation-
    invariant). Different-term length-1 spans can never overlap (one
    term per position), so no cross-term constraint is needed.
    """
    n = len(terms)
    if n < 2:
        raise ValueError("span_near needs >= 2 clauses")
    stats = searcher.index.term_stats(sorted(set(terms)))
    if any(t not in stats for t in terms):
        return searcher.index.spark.createDataFrame([], "doc_id long")
    if in_order:
        cur = _positions(searcher, terms[0], "p0")
        for i in range(1, n):
            nxt = _positions(searcher, terms[i], f"p{i}")
            cond = F.col(f"p{i}") > F.col(f"p{i-1}")
            cur = cur.join(nxt, on="doc_id").where(cond)
        width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
    else:
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        cur = None
        for t, idxs in by_term.items():
            grp = _positions(searcher, t, f"p{idxs[0]}")
            for prev, i in zip(idxs, idxs[1:]):
                nxt = _positions(searcher, t, f"p{i}")
                grp = grp.join(nxt, on="doc_id").where(
                    F.col(f"p{i}") > F.col(f"p{prev}")
                )
            cur = grp if cur is None else cur.join(grp, on="doc_id")
        cols = [F.col(f"p{i}") for i in range(n)]
        width = F.greatest(*cols) - F.least(*cols) - F.lit(n - 1)
    return (
        cur.where(width <= F.lit(slop)).select("doc_id").distinct()
    )


def span_or(searcher: Searcher, terms: list[str]) -> DataFrame:
    """Docs with any clause span (SpanOrQuery union) — distinct doc_id."""
    stats = searcher.index.term_stats(sorted(set(terms)))
    present = [t for t in terms if t in stats]
    if not present:
        return searcher.index.spark.createDataFrame([], "doc_id long")
    return (
        searcher._postings_for(present)
        .select("doc_id")
        .distinct()
    )


def span_not(
    searcher: Searcher, include: str, exclude: str
) -> DataFrame:
    """Docs retaining at least one ``include`` span that does not
    overlap an ``exclude`` span (term spans overlap iff equal position).
    """
    stats = searcher.index.term_stats(sorted({include, exclude}))
    if include not in stats:
        return searcher.index.spark.createDataFrame([], "doc_id long")
    inc = _positions(searcher, include, "pos")
    if exclude not in stats:
        return inc.select("doc_id").distinct()
    exc = _positions(searcher, exclude, "pos").withColumn(
        "is_exc", F.lit(1)
    )
    kept = inc.join(exc, on=["doc_id", "pos"], how="left_anti")
    return kept.select("doc_id").distinct()


def span_position_range(
    searcher: Searcher, term: str, start: int, end: int
) -> DataFrame:
    """SpanPositionRangeQuery (lucene/core/.../search/spans/
    SpanPositionRangeQuery.java:30-60 acceptPosition): spans with
    start() >= start and end() <= end — SpanFirst is the start=0
    special case. Term spans have length 1, so a position p matches
    iff start <= p and p + 1 <= end. Constant-score doc set."""
    stats = searcher.index.term_stats([term])
    if term not in stats:
        return searcher.index.spark.createDataFrame([], "doc_id long")
    p = _positions(searcher, term, "pos")
    return (
        p.where(
            (F.col("pos") >= F.lit(int(start)))
            & (F.col("pos") + 1 <= F.lit(int(end)))
        )
        .select("doc_id")
        .distinct()
    )


def field_masking_span_near(
    fielded_searcher,
    clauses: list[tuple[str, str]],
    slop: int,
    in_order: bool = True,
) -> DataFrame:
    """FieldMaskingSpanQuery composition (lucene/core/.../spans/
    FieldMaskingSpanQuery.java:30-70): each (field, term) clause's
    spans come from ITS OWN field's postings, but are treated as if
    they belonged to one field so SpanNear accepts them — raw position
    counters are compared across fields exactly as the reference does
    (the javadoc's "same analyzer / parallel fields" caveat applies
    unchanged). ``fielded_searcher`` is a FieldedSearcher; clause
    order matters for ordered near. Constant-score doc set."""
    from .surround import join_span_frames

    frames = []
    for field, term in clauses:
        s = fielded_searcher.searchers[field]
        stats = s.index.term_stats([term])
        if term not in stats:
            return fielded_searcher.index.spark.createDataFrame(
                [], "doc_id long"
            )
        frames.append(
            s._postings_for([term], want_positions=True)
            .select("doc_id", F.explode("positions").alias("s"))
            .select(
                "doc_id",
                F.col("s").cast("int").alias("s"),
                (F.col("s") + 1).cast("int").alias("e"),
            )
        )
    return (
        join_span_frames(frames, slop=slop, ordered=in_order)
        .select("doc_id")
        .distinct()
    )


def span_near_scored(
    searcher: Searcher,
    terms: list[str],
    slop: int,
    k: int = 10,
) -> DataFrame:
    """SCORED ordered SpanNearQuery — top-k (doc_id, score) where
    score is the SpanScorer sloppy-span BM25
    (lucene/core/.../spans/SpanScorer.java setFreqCurrentDoc: freq =
    sum of sloppyFreq(matchLength) over the NearSpansOrdered
    enumeration, BM25Similarity.java:71-73 sloppyFreq = 1/(d+1)) with
    idf summed over the query's DISTINCT terms (SpanWeight extractTerms
    is a set) and the quantized index norm.

    Reuses the fuzz-pinned NearSpansOrdered walk from the payload
    module (payloads._near_ordered_walk, pinned against a test-only
    transcription of NearSpansOrdered.java:182-337) with payloads
    ignored. Plan: pruned positions scan -> one groupBy(doc) with an
    all-terms filter -> Arrow-batched per-doc walk -> broadcast-free
    scoring (norms are denormalized onto posting rows)."""
    import math

    from ..index.norms import NORM_TABLE
    from .payloads import _near_ordered_walk

    idx = searcher.index
    uniq = sorted(set(terms))
    stats = idx.term_stats(uniq)
    if any(t not in stats for t in uniq):
        return idx.spark.createDataFrame([], "doc_id long, score double")
    n_docs = idx.stats.max_doc
    avgdl = idx.stats.avgdl
    idf_sum = sum(
        math.log(1 + (n_docs - stats[t][0] + 0.5) / (stats[t][0] + 0.5))
        for t in uniq
    )
    rows = searcher._postings_for(uniq, want_positions=True).select(
        "doc_id", "term", "positions", "norm_byte"
    )
    cand = (
        rows.groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("term", "positions")).alias("occ"),
            F.first("norm_byte").alias("norm_byte"),
            F.countDistinct("term").alias("nt"),
        )
        .where(F.col("nt") == len(uniq))
        .select("doc_id", "occ", "norm_byte")
    )
    clause_terms = list(terms)
    norm_table = [float(x) for x in NORM_TABLE]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, scores = [], []
            for did, occ, nb in zip(
                pdf["doc_id"], pdf["occ"], pdf["norm_byte"]
            ):
                by_term = {o["term"]: list(o["positions"]) for o in occ}
                pos_lists = [by_term[t] for t in clause_terms]
                freq, _ = _near_ordered_walk(pos_lists, pos_lists, slop)
                if freq <= 0.0:
                    continue
                q = norm_table[int(nb) & 0xFF]
                score = (
                    idf_sum
                    * (1.2 + 1)
                    * freq
                    / (freq + 1.2 * ((1 - 0.75) + 0.75 * q / avgdl))
                )
                ids.append(did)
                scores.append(score)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "score": pd.Series(scores, dtype="float64"),
                }
            )

    scored = cand.mapInPandas(run, "doc_id long, score double")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _expand_clause(
    searcher: Searcher, clause, max_expansions: int = 1024
) -> list[str]:
    """SpanMultiTermQueryWrapper rewrite: expand a ('prefix'|'wildcard',
    pattern) clause against the term dictionary into its matching
    terms — the SpanOr-of-term-spans the wrapper rewrites to
    (L/search/spans/SpanMultiTermQueryWrapper.java:40-90,
    SCORING_SPAN_QUERY_REWRITE). Literal strings pass through."""
    if isinstance(clause, str):
        return [clause]
    kind, pat = clause
    ts = searcher.index.terms_stats
    if kind == "prefix":
        matched = ts.where(F.col("term").startswith(pat))
    elif kind == "wildcard":
        import re as _re

        parts = []
        i = 0
        while i < len(pat):
            ch = pat[i]
            if ch == "\\" and i + 1 < len(pat):
                parts.append(_re.escape(pat[i + 1]))
                i += 2
                continue
            parts.append(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            )
            i += 1
        matched = ts.where(F.col("term").rlike("^" + "".join(parts) + "$"))
    else:
        raise ValueError(f"unknown multiterm span clause {kind!r}")
    rows = matched.select("term").limit(max_expansions + 1).collect()
    if len(rows) > max_expansions:
        raise ValueError(
            "span multiterm clause expands past the 1024-clause cap "
            "(BooleanQuery.maxClauseCount, the wrapper's rewrite limit)"
        )
    return [r["term"] for r in rows]


def _clause_positions(
    searcher: Searcher, terms: list[str], alias: str
) -> DataFrame:
    """Positions of a (possibly multi-term) span clause — the union of
    the expansions' term spans, one pruned decode for all of them."""
    return (
        searcher._postings_for(sorted(set(terms)), want_positions=True)
        .select("doc_id", F.explode("positions").alias(alias))
        .distinct()
    )


def span_near_multi(
    searcher: Searcher,
    clauses: list,
    slop: int,
    max_expansions: int = 1024,
) -> DataFrame:
    """Ordered SpanNearQuery whose clauses may be multi-term wrappers:
    a clause is a literal term or ('prefix'|'wildcard', pattern) —
    SpanMultiTermQueryWrapper inside SpanNearQuery. Match rule is the
    NearSpansOrdered one (strictly increasing positions, width - (n-1)
    <= slop); returns distinct doc_id."""
    n = len(clauses)
    if n < 2:
        raise ValueError("span_near_multi needs >= 2 clauses")
    expanded = [
        _expand_clause(searcher, c, max_expansions) for c in clauses
    ]
    if any(not terms for terms in expanded):
        return searcher.index.spark.createDataFrame([], "doc_id long")
    cur = _clause_positions(searcher, expanded[0], "p0")
    for i in range(1, n):
        nxt = _clause_positions(searcher, expanded[i], f"p{i}")
        cur = cur.join(nxt, on="doc_id").where(
            F.col(f"p{i}") > F.col(f"p{i-1}")
        )
    width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
    return cur.where(width <= F.lit(slop)).select("doc_id").distinct()
