"""Surround query language — parser + span-algebra evaluation.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/ — the JavaCC grammar (parser/QueryParser.jj:330-410) and the
query tree (query/*.java):

  - ``W`` = ordered distance, ``N`` = unordered distance
    (QueryParser.jj:351,370 — W builds ordered=true, N ordered=false);
    both accept a numeric distance prefix 2-99 (``3W(a,b)``); default
    distance is 1 (adjacent). SpanNearQuery slop = distance - 1
    (query/DistanceQuery.java:76-100 ``new SpanNearQuery(clauses,
    getOpDistance() - 1, subQueriesOrdered())``).
  - ``AND``/``OR``/``NOT`` are doc-level boolean operators; operators
    are case-insensitive; all but NOT also have a prefix list form
    ``AND(a, b, c)`` (QueryParser.jj PrefixOperatorQuery:388-410).
  - Precedence, loosest to tightest: OR < AND < NOT < N < W < primary
    (the .jj production nesting OrQuery -> AndQuery -> NotQuery ->
    NQuery -> WQuery -> PrimaryQuery).
  - Terms support trailing-``*`` prefix expansion (SrndPrefixQuery,
    min prefix length 3) and ``*``/``?`` truncation patterns
    (SrndTruncQuery, min 3 literal chars) — QueryParser.jj constants
    minimumPrefixLength/minimumCharsInTrunc:78-79. Expansion is capped
    at ``MAX_BASIC_QUERIES`` basic queries, mirroring
    query/BasicQueryFactory.java + TooManyBasicQueries.
  - Distance operands may be terms, prefix/trunc expansions, OR
    queries, or nested distance queries — NOT and AND are rejected
    inside W/N (query/DistanceQuery.java:50-66
    ``distanceSubQueryNotAllowed``; only DistanceSubQuery
    implementors compose).

Span semantics mirrored from lucene/core/.../search/spans/:

  - Ordered (NearSpansOrdered.java:226-330): an assignment of one span
    per clause with adjacent pairs "docSpansOrdered" (start strictly
    increasing, ties broken by end) and total slop
    ``sum(max(0, s[i+1] - e[i])) <= slop`` (shrinkToAfterShortestMatch
    adds only non-overlapping gaps, :317-319). Composite span =
    (s_first, e_last).
  - Unordered (NearSpansUnordered.java:124-176): window
    ``(max_end - min_start) - sum(lengths) <= slop``; clauses produced
    by the SAME subquery must occupy distinct spans (SpansCell overlap
    rule :157-176) — enforced by lexicographically ascending (s, e)
    within identical-clause groups. Composite span =
    (min_start, max_end).

Spark-first shape: every leaf is one pruned positions lookup on the
segment store; each distance operator is a doc_id-keyed join chain
(same key distribution the postings already have); boolean operators
are doc-set joins/unions. Declarative "exists an assignment"
evaluation replaces the reference's doc-at-a-time span iterators —
identical doc sets, no driver-side iteration.

The evaluator yields CONSTANT-SCORE doc sets (the same shape as the
span_* gates — Solr's SurroundQParserPlugin output is normally used in
``fq``); ``^boost`` weights are parsed and kept in the AST but do not
alter a constant-score doc set.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher

# query/BasicQueryFactory.java — Solr's SurroundQParserPlugin default
MAX_BASIC_QUERIES = 1000
# parser/QueryParser.jj:78-79
MIN_PREFIX_LENGTH = 3
MIN_CHARS_IN_TRUNC = 3


class SurroundParseError(ValueError):
    """Mirrors surround/parser/ParseException.java."""


class TooManyBasicQueries(ValueError):
    """Mirrors surround/query/TooManyBasicQueries.java — a prefix or
    truncation expanded past MAX_BASIC_QUERIES index terms."""


# ----------------------------------------------------------------- AST


@dataclass(frozen=True)
class SrndTerm:
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class SrndPrefix:
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class SrndTrunc:
    pattern: str  # raw pattern with * / ?
    boost: float = 1.0


@dataclass(frozen=True)
class SrndOr:
    clauses: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class SrndAnd:
    clauses: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class SrndNot:
    # clauses[0] NOT clauses[1] NOT clauses[2] ... (left-assoc n-ary,
    # QueryParser.jj NotQuery production)
    clauses: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class SrndDistance:
    clauses: tuple
    distance: int
    ordered: bool
    boost: float = 1.0


# -------------------------------------------------------------- lexer

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | \^(?P<weight>\d+(?:\.\d+)?)
      | "(?P<quoted>[^"]*)"
      | (?P<word>[^\s(),^"]+)
    )""",
    re.VERBOSE,
)

_DIST_RX = re.compile(r"^(\d{1,2})?([wWnN])$")


def _tokenize(s: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RX.match(s, i)
        if not m or m.end() == i:
            if s[i:].strip():
                raise SurroundParseError(f"cannot lex at: {s[i:]!r}")
            break
        i = m.end()
        if m.group("lparen"):
            toks.append(("(", None))
        elif m.group("rparen"):
            toks.append((")", None))
        elif m.group("comma"):
            toks.append((",", None))
        elif m.group("weight") is not None:
            toks.append(("^", float(m.group("weight"))))
        elif m.group("quoted") is not None:
            toks.append(("term", m.group("quoted")))
        else:
            w = m.group("word")
            dm = _DIST_RX.match(w)
            up = w.upper()
            if dm:
                dist = int(dm.group(1)) if dm.group(1) else 1
                if dist < 1:
                    raise SurroundParseError(f"bad distance in {w!r}")
                kind = "W" if dm.group(2) in "wW" else "N"
                toks.append((kind, dist))
            elif up in ("OR", "AND", "NOT"):
                toks.append((up, None))
            else:
                toks.append(("word", w))
    return toks


# ------------------------------------------------------------- parser


class _Parser:
    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, object]:
        if self.i >= len(self.toks):
            raise SurroundParseError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str):
        k, v = self.next()
        if k != kind:
            raise SurroundParseError(f"expected {kind!r}, got {k!r}")
        return v

    # OrQuery := AndQuery (OR AndQuery)*        (QueryParser.jj:300)
    def or_query(self):
        q = self.and_query()
        clauses = None
        while self.peek() == "OR":
            self.next()
            if clauses is None:
                clauses = [q]
            clauses.append(self.and_query())
        return q if clauses is None else SrndOr(tuple(clauses))

    def and_query(self):
        q = self.not_query()
        clauses = None
        while self.peek() == "AND":
            self.next()
            if clauses is None:
                clauses = [q]
            clauses.append(self.not_query())
        return q if clauses is None else SrndAnd(tuple(clauses))

    def not_query(self):
        q = self.n_query()
        clauses = None
        while self.peek() == "NOT":
            self.next()
            if clauses is None:
                clauses = [q]
            clauses.append(self.n_query())
        return q if clauses is None else SrndNot(tuple(clauses))

    # pairwise left-assoc (QueryParser.jj NQuery/WQuery:339-374)
    def n_query(self):
        q = self.w_query()
        while self.peek() == "N":
            _, dist = self.next()
            r = self.w_query()
            q = SrndDistance((q, r), int(dist), ordered=False)
        return q

    def w_query(self):
        q = self.primary()
        while self.peek() == "W":
            _, dist = self.next()
            r = self.primary()
            q = SrndDistance((q, r), int(dist), ordered=True)
        return q

    def primary(self):
        k = self.peek()
        if k == "(":
            self.next()
            q = self.or_query()
            self.expect(")")
        elif k in ("OR", "AND", "N", "W"):
            kind, dist = self.next()
            if self.peek() != "(":
                raise SurroundParseError(
                    f"prefix operator {kind} needs a '(' list"
                )
            self.next()
            clauses = [self.or_query()]
            while self.peek() == ",":
                self.next()
                clauses.append(self.or_query())
            self.expect(")")
            if kind == "OR":
                q = SrndOr(tuple(clauses))
            elif kind == "AND":
                q = SrndAnd(tuple(clauses))
            else:
                q = SrndDistance(
                    tuple(clauses), int(dist), ordered=(kind == "W")
                )
        elif k in ("word", "term"):
            q = self.simple_term()
        else:
            raise SurroundParseError(f"unexpected token {k!r}")
        # OptionalWeights (QueryParser.jj:430-441): ^w may repeat
        boost = 1.0
        saw = False
        while self.peek() == "^":
            _, w = self.next()
            boost *= float(w)
            saw = True
        if saw:
            q = _with_boost(q, q.boost * boost)
        return q

    def simple_term(self):
        kind, text = self.next()
        if kind == "term":  # quoted — no wildcard interpretation
            return SrndTerm(text)
        w = str(text)
        has_q = "?" in w
        stars = w.count("*")
        if not has_q and stars == 0:
            return SrndTerm(w)
        if not has_q and stars == 1 and w.endswith("*"):
            p = w[:-1]
            if len(p) < MIN_PREFIX_LENGTH:
                raise SurroundParseError(
                    f"Too unrestrictive prefix: {w!r}"
                )
            return SrndPrefix(p)
        lits = len(w.replace("*", "").replace("?", ""))
        if lits < MIN_CHARS_IN_TRUNC:
            raise SurroundParseError(
                f"Too unrestrictive truncation: {w!r}"
            )
        return SrndTrunc(w)

    def parse(self):
        q = self.or_query()
        if self.i != len(self.toks):
            k, _ = self.toks[self.i]
            raise SurroundParseError(f"trailing input at token {k!r}")
        return q


def _with_boost(q, boost: float):
    cls = type(q)
    kw = {f.name: getattr(q, f.name) for f in q.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    kw["boost"] = boost
    return cls(**kw)


def parse_surround(s: str):
    """Parse a surround query string into the AST above."""
    return _Parser(s).parse()


# ---------------------------------------------------------- evaluator

_SPAN_CAPABLE = (SrndTerm, SrndPrefix, SrndTrunc, SrndOr, SrndDistance)


def _expand_terms(searcher: Searcher, node) -> list[str]:
    """Prefix/trunc expansion against the terms dictionary, capped at
    MAX_BASIC_QUERIES (BasicQueryFactory.java)."""
    ts = searcher.index.terms_stats
    if isinstance(node, SrndPrefix):
        matched = ts.where(F.col("term").startswith(node.prefix))
    else:
        parts = []
        for ch in node.pattern:
            parts.append(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            )
        matched = ts.where(F.col("term").rlike("^" + "".join(parts) + "$"))
    rows = (
        matched.select("term").limit(MAX_BASIC_QUERIES + 1).collect()
    )
    if len(rows) > MAX_BASIC_QUERIES:
        raise TooManyBasicQueries(
            f"expansion of {node} exceeds {MAX_BASIC_QUERIES} terms"
        )
    return [r["term"] for r in rows]


def _term_spans(searcher: Searcher, terms: list[str]) -> DataFrame:
    """(doc_id, s, e) length-1 spans for a union of terms."""
    if not terms:
        return searcher.index.spark.createDataFrame(
            [], "doc_id long, s int, e int"
        )
    stats = searcher.index.term_stats(sorted(set(terms)))
    present = [t for t in set(terms) if t in stats]
    if not present:
        return searcher.index.spark.createDataFrame(
            [], "doc_id long, s int, e int"
        )
    return (
        searcher._postings_for(present, want_positions=True)
        .select("doc_id", F.explode("positions").alias("s"))
        .select(
            "doc_id",
            F.col("s").cast("int").alias("s"),
            (F.col("s") + 1).cast("int").alias("e"),
        )
    )


def _spans(searcher: Searcher, node) -> DataFrame:
    """Span frame (doc_id, s, e) for a distance-composable node."""
    if isinstance(node, SrndTerm):
        return _term_spans(searcher, [node.text])
    if isinstance(node, (SrndPrefix, SrndTrunc)):
        return _term_spans(searcher, _expand_terms(searcher, node))
    if isinstance(node, SrndOr):
        for c in node.clauses:
            if not isinstance(c, _SPAN_CAPABLE):
                raise SurroundParseError(
                    f"operator not allowed inside a distance OR: {c}"
                )
        out = None
        for c in node.clauses:
            f_ = _spans(searcher, c)
            out = f_ if out is None else out.unionByName(f_)
        return out.distinct()
    if isinstance(node, SrndDistance):
        return _distance_spans(searcher, node)
    # DistanceQuery.distanceSubQueryNotAllowed (DistanceQuery.java:50-66)
    raise SurroundParseError(
        f"operator not allowed inside a distance query: {node}"
    )


def _distance_spans(searcher: Searcher, node: SrndDistance) -> DataFrame:
    n = len(node.clauses)
    if n < 2:
        raise SurroundParseError("distance operator needs >= 2 operands")
    frames = [_spans(searcher, c) for c in node.clauses]
    # identical clauses must occupy distinct spans
    # (NearSpansUnordered SpansCell overlap rule :157-176)
    groups: dict[object, list[int]] = {}
    for i, c in enumerate(node.clauses):
        groups.setdefault(c, []).append(i)
    return join_span_frames(
        frames,
        slop=node.distance - 1,
        ordered=node.ordered,
        same_clause_groups=list(groups.values()),
    )


def join_span_frames(
    frames: list[DataFrame],
    slop: int,
    ordered: bool,
    same_clause_groups: list[list[int]] | None = None,
) -> DataFrame:
    """SpanNear over pre-built (doc_id, s, e) span frames — the shared
    kernel for surround distance ops and complex phrases. Ordered:
    strictly increasing starts (ties by end) with
    Σ max(0, s[i+1]-e[i]) <= slop (NearSpansOrdered.java:226-330);
    unordered: (max_end - min_start) - Σ lengths <= slop
    (NearSpansUnordered.java:124-176), with lexicographically ascending
    (s, e) inside each same-clause group."""
    n = len(frames)
    frames = [
        f.distinct().select(
            "doc_id",
            F.col("s").alias(f"s{i}"),
            F.col("e").alias(f"e{i}"),
        )
        for i, f in enumerate(frames)
    ]
    cur = frames[0]
    if ordered:
        for i in range(1, n):
            cur = cur.join(frames[i], on="doc_id").where(
                (F.col(f"s{i-1}") < F.col(f"s{i}"))
                | (
                    (F.col(f"s{i-1}") == F.col(f"s{i}"))
                    & (F.col(f"e{i-1}") < F.col(f"e{i}"))
                )
            )
        gap = F.lit(0)
        for i in range(1, n):
            gap = gap + F.greatest(
                F.lit(0), F.col(f"s{i}") - F.col(f"e{i-1}")
            )
        cur = cur.where(gap <= F.lit(slop))
        return cur.select(
            "doc_id",
            F.col("s0").alias("s"),
            F.col(f"e{n-1}").alias("e"),
        ).distinct()
    # unordered
    for i in range(1, n):
        cur = cur.join(frames[i], on="doc_id")
    for idxs in same_clause_groups or []:
        for prev, i in zip(idxs, idxs[1:]):
            cur = cur.where(
                (F.col(f"s{i}") > F.col(f"s{prev}"))
                | (
                    (F.col(f"s{i}") == F.col(f"s{prev}"))
                    & (F.col(f"e{i}") > F.col(f"e{prev}"))
                )
            )
    smin = F.least(*[F.col(f"s{i}") for i in range(n)])
    emax = F.greatest(*[F.col(f"e{i}") for i in range(n)])
    total = F.lit(0)
    for i in range(n):
        total = total + (F.col(f"e{i}") - F.col(f"s{i}"))
    cur = cur.where(emax - smin - total <= F.lit(slop))
    return cur.select(
        "doc_id", smin.cast("int").alias("s"), emax.cast("int").alias("e")
    ).distinct()


def _doc_set(searcher: Searcher, node) -> DataFrame:
    if isinstance(node, SrndAnd):
        out = _doc_set(searcher, node.clauses[0])
        for c in node.clauses[1:]:
            out = out.join(
                _doc_set(searcher, c), on="doc_id", how="left_semi"
            )
        return out
    if isinstance(node, SrndNot):
        out = _doc_set(searcher, node.clauses[0])
        for c in node.clauses[1:]:
            out = out.join(
                _doc_set(searcher, c), on="doc_id", how="left_anti"
            )
        return out
    if isinstance(node, SrndOr):
        # at doc level an OR may hold AND/NOT children (grammar allows
        # it outside distance context)
        out = None
        for c in node.clauses:
            d = _doc_set(searcher, c)
            out = d if out is None else out.unionByName(d)
        return out.distinct()
    return _spans(searcher, node).select("doc_id").distinct()


def surround_doc_ids(searcher: Searcher, query: str) -> DataFrame:
    """Parse + evaluate a surround query; returns the constant-score
    doc set as a distinct ``doc_id`` DataFrame (the
    SurroundQParserPlugin ``fq`` shape)."""
    return _doc_set(searcher, parse_surround(query))
