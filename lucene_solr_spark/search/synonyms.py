"""Query-time synonym expansion — the SynonymFilter slot, query side.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymFilter.java injects synonym tokens at the same position;
a query analyzed through it becomes a disjunction of the variants
(lucene/queryparser classic behavior for stacked tokens). We implement
the query-side expansion directly on the Query AST: every TermQuery whose
term has synonyms becomes a SHOULD-disjunction over the synonym set.

Index-time expansion (bigger index, cheaper queries) would reuse the
analyzer UDF slot instead; query-time keeps the index canonical — the
standard trade, chosen here because the oracle-pinned index must stay
StandardAnalyzer-exact.
"""

from __future__ import annotations

from .query import (
    BooleanClause,
    BooleanQuery,
    DisMaxQuery,
    PhraseQuery,
    Query,
    TermQuery,
)


def build_synonym_map(groups: list[list[str]]) -> dict[str, list[str]]:
    """Symmetric synonym groups -> term -> sorted variant list (incl.
    itself)."""
    out: dict[str, set[str]] = {}
    for grp in groups:
        low = [g.lower() for g in grp]
        for t in low:
            out.setdefault(t, set()).update(low)
    return {t: sorted(v) for t, v in out.items()}


def expand_query(q: Query, syn: dict[str, list[str]]) -> Query:
    """Rewrite the AST, expanding TermQuery leaves through the synonym
    map. Phrase terms are NOT expanded (SynonymFilter positions inside
    phrases need graph analysis — out of scope v1, like the reference's
    own sausage-graph caveats)."""
    if isinstance(q, TermQuery):
        variants = syn.get(q.term)
        if not variants or variants == [q.term]:
            return q
        return BooleanQuery(
            [
                BooleanClause(TermQuery(v, q.boost), "SHOULD")
                for v in variants
            ]
        )
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            [
                BooleanClause(expand_query(c.query, syn), c.occur)
                for c in q.clauses
            ],
            q.min_should_match,
        )
    if isinstance(q, DisMaxQuery):
        return DisMaxQuery(
            [expand_query(s, syn) for s in q.queries], q.tie_breaker
        )
    if isinstance(q, PhraseQuery):
        return q
    return q
