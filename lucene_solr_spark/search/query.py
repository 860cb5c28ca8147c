"""Query AST — the Lucene Query tree analogue, plus the rewrite step.

References:
  - BooleanQuery MUST/SHOULD/MUST_NOT + minNrShouldMatch
    (lucene/core/.../search/BooleanQuery.java:42,170-359)
  - rewrite-to-fixpoint (IndexSearcher.java:597-604): single-clause
    Boolean collapse, MultiTermQuery -> disjunction expansion
  - DisjunctionMaxQuery (DisjunctionMaxQuery.java:1-298)
  - PhraseQuery (PhraseQuery.java:47-82)
  - PrefixQuery/WildcardQuery/FuzzyQuery rewrite against the term dict
    (MultiTermQuery.java, WildcardQuery.java, FuzzyQuery.java)
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllQuery(Query):
    pass


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0

    def __init__(self, terms, slop: int = 0, boost: float = 1.0):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "boost", float(boost))


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase accepting ANY of several terms at each position — the
    synonym-phrase query (lucene/core/src/java/org/apache/lucene/search/
    MultiPhraseQuery.java:52-88; execution merges each slot's postings
    via UnionDocsAndPositionsEnum :418-520). idf is summed over EVERY
    term of every position array in array order (MultiPhraseWeight
    ctor :146-159) — a term in two arrays contributes twice, and a
    zero-df term still contributes idf(0, maxDoc)."""

    positions: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0

    def __init__(self, positions, slop: int = 0, boost: float = 1.0):
        object.__setattr__(
            self, "positions", tuple(tuple(p) for p in positions)
        )
        object.__setattr__(self, "slop", int(slop))
        object.__setattr__(self, "boost", float(boost))


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: str = "SHOULD"  # MUST | SHOULD | MUST_NOT


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    min_should_match: int = 0

    def __init__(self, clauses, min_should_match: int = 0):
        object.__setattr__(self, "clauses", tuple(clauses))
        object.__setattr__(self, "min_should_match", int(min_should_match))


@dataclass(frozen=True)
class DisMaxQuery(Query):
    queries: tuple[Query, ...]
    tie_breaker: float = 0.0

    def __init__(self, queries, tie_breaker: float = 0.0):
        object.__setattr__(self, "queries", tuple(queries))
        object.__setattr__(self, "tie_breaker", float(tie_breaker))


@dataclass(frozen=True)
class PrefixQuery(Query):
    """Rewrites against terms_stats to a constant-score disjunction
    (MultiTermQuery CONSTANT_SCORE rewrite)."""

    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # Lucene wildcard syntax: * and ?
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Full-term regular-expression match (RegexpQuery.java /
    AutomatonQuery.java): the WHOLE term must match (Lucene compiles
    the regexp to an automaton run over complete terms), so execution
    anchors the pattern with ^..$. Rewrites to a constant-score doc set
    like the other MultiTermQueries."""

    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class FieldTermQuery(Query):
    """Exact-match query on a non-text stored/docvalues column
    (Solr fielded syntax `field:value` over a StrField/TrieField —
    S/search/ExtendedDismaxQParserPlugin.java field clauses). Scored as
    a constant (boost) over docs where the column equals the value;
    Catalyst pushes the predicate into the parquet scan."""

    field: str
    value: str
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """Lexicographic term range (TermRangeQuery.java), inclusive bounds
    optional; rewrites to a constant-score doc set like the other
    MultiTermQueries. Numeric ranges need no query type at all — Spark
    evaluates column predicates natively (SURVEY.md §1.4)."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class FieldRangeQuery(Query):
    """Range over a non-text stored column — the Solr fielded-range
    syntax ``price:[10 TO 20]`` (classic QueryParser.jj range grammar;
    TrieField numeric / StrField lexicographic semantics). Bounds are
    the raw query-string literals; numeric-looking bounds compare
    numerically, otherwise lexicographically (Solr resolves this from
    the schema field type — with schemaless columns the literal format
    is the only signal). '*' (None) = open bound. Constant-score doc
    set; Catalyst pushes the predicate into the parquet scan."""

    field: str
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


# ---- convenience constructors ----

def And(*terms: str) -> BooleanQuery:
    return BooleanQuery([BooleanClause(TermQuery(t), "MUST") for t in terms])


def Or(*terms: str, min_should_match: int = 1) -> BooleanQuery:
    return BooleanQuery(
        [BooleanClause(TermQuery(t), "SHOULD") for t in terms],
        min_should_match=min_should_match,
    )


def rewrite(q: Query) -> Query:
    """Rewrite to fixpoint (IndexSearcher.java:597-604): collapse
    single-clause pure-MUST/SHOULD booleans; 1-term PhraseQuery ->
    TermQuery (PhraseQuery.rewrite, PhraseQuery.java:270-276 — also
    what makes stopword-stripped phrases like '"the scan"~2' legal)."""
    if isinstance(q, PhraseQuery) and len(q.terms) == 1:
        return TermQuery(q.terms[0], q.boost)
    if isinstance(q, MultiPhraseQuery):
        # MultiPhraseQuery.rewrite (MultiPhraseQuery.java:281-295): a
        # single-slot multi-phrase is a plain disjunction of its
        # alternatives; all-singleton slots are an ordinary phrase
        if len(q.positions) == 1:
            return rewrite(
                BooleanQuery(
                    [
                        BooleanClause(TermQuery(t, q.boost), "SHOULD")
                        for t in q.positions[0]
                    ]
                )
            )
        if all(len(arr) == 1 for arr in q.positions):
            return PhraseQuery(
                [arr[0] for arr in q.positions], q.slop, q.boost
            )
        return q
    if isinstance(q, BooleanQuery):
        clauses = tuple(
            BooleanClause(rewrite(c.query), c.occur) for c in q.clauses
        )
        # collapse only when msm cannot change semantics: a single
        # SHOULD needs msm <= 1, a single MUST needs msm == 0 (an
        # unsatisfiable msm must keep matching nothing, BooleanQuery
        # minNrShouldMatch semantics)
        if len(clauses) == 1 and (
            (clauses[0].occur == "SHOULD" and q.min_should_match <= 1)
            or (clauses[0].occur == "MUST" and q.min_should_match == 0)
        ):
            return clauses[0].query
        return BooleanQuery(clauses, q.min_should_match)
    return q
