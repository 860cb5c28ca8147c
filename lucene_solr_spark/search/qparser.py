"""Query-string parsers — the Solr QParserPlugin surface (SURVEY.md §2.11).

References:
  - classic lucene syntax: solr/core/src/java/org/apache/solr/search/
    LuceneQParserPlugin.java -> lucene/queryparser/.../classic/
    QueryParser.jj grammar (subset: clauses with +/- and AND/OR/NOT,
    grouping, phrases, prefix/wildcard/fuzzy/range terms, ^boost)
  - dismax: solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:
    user query words become a DisjunctionMaxQuery per word over the qf
    fields, combined into a BooleanQuery with mm (minimum-should-match)
  - analysis parity: query terms run through the same analyzer chain as
    indexing (Analyzer bound per-field at query time,
    solr/example/solr/collection1/conf/schema.xml:421-433)

The parser produces our Query AST (search/query.py); execution is the
ordinary Searcher path. Pure Python — no Spark dependency — so it is unit
tested without a session.
"""

from __future__ import annotations

import re

from ..analysis.tokenizer import analyze
from .query import (
    BooleanClause,
    BooleanQuery,
    DisMaxQuery,
    FieldRangeQuery,
    FieldTermQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RX = re.compile(
    r"""
    \s*(?:
      (?P<lparen>\() |
      (?P<rparen>\)) |
      (?P<range>(?:(?P<rngfld>[A-Za-z_][A-Za-z0-9_]*):)?
        (?P<rlb>[\[{])\s*(?P<rlo>\S+?)\s+TO\s+(?P<rhi>\S+?)\s*
        (?P<rrb>[\]}])) |
      (?P<phrase>"(?P<phbody>(?:\\.|[^"\\])*)"(?:~(?P<phslop>\d+))?) |
      (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
      (?P<plus>\+) | (?P<minus>-) |
      (?P<star>\*:\*) |
      (?P<fielded>[A-Za-z_][A-Za-z0-9_]*):
        (?P<fval>(?:\\.|[^\s():+\-"^\\])+) |
      (?P<word>(?:\\.|[^\s():+\-"^\\])+
               (?:-(?:\\.|[^\s():+\-"^\\])+)*)
    )(?:\^(?P<boost>[0-9.]+))?
    """,
    re.VERBOSE,
)
# '-' is an operator only at a clause boundary (start/whitespace/'(');
# mid-word hyphens stay in the token — classic QueryParser.jj behavior,
# so 'well-known' analyzes to a phrase instead of 'well AND NOT known'.
# Backslash escapes (QueryParserBase.discardEscapeChar): '\X' makes X a
# literal everywhere a word/field-value/phrase character is read, so
# '\+foo', 'sc\*n*' (literal-star prefix) and '"say \"hi\""' parse.
# Ranges follow the full QueryParser.jj grammar: optional field prefix,
# '['/']' inclusive vs '{'/'}' exclusive per end, '*' = open bound.


def _unescape(s: str) -> str:
    """discardEscapeChar: drop the backslash, keep the next char."""
    return re.sub(r"\\(.)", r"\1", s)


class QueryParseError(ValueError):
    pass


_WILDCARD_SPLIT_RX = re.compile(r"((?<!\\)[*?])")


def _analyze_single_chunk(chunk: str, analyzer) -> str:
    """AnalyzingQueryParser.analyzeSingleChunk (lucene/queryparser/src/
    java/org/apache/lucene/queryparser/analyzing/AnalyzingQueryParser.java
    :141-186): each non-wildcard fragment of a multiterm must analyze to
    EXACTLY one token — zero (swallowed by a stop/length filter) or
    several (chain splits it) is a ParseException in the reference."""
    terms, _ = analyzer(_unescape(chunk))
    if len(terms) != 1:
        raise QueryParseError(
            f"analyzer produced {len(terms)} tokens for multiterm chunk "
            f"{chunk!r} (AnalyzingQueryParser requires exactly 1)"
        )
    return terms[0]


def _word_query(word: str, boost: float, analyzer=None) -> Query | None:
    """One bare word -> Term/Prefix/Wildcard/Fuzzy query, analyzed.
    Escaped specials ('\\*', '\\~', '\\?') are literals: they never
    trigger the wildcard/fuzzy readings (QueryParser.jj escaping).

    ``analyzer=None`` is classic QueryParser behavior: term/fuzzy slots
    run through the default chain, wildcard/prefix slots are merely
    lowercased. Passing the index's analyzer chain gives
    AnalyzingQueryParser semantics (AnalyzingQueryParser.java:44-120):
    the non-wildcard fragments run through the SAME chain the index was
    built with, so a folded/stemmed store matches ('Résumé*' ->
    'resume*', 'tables*' -> 'table*' under a stemming chain)."""
    an = analyzer if analyzer is not None else analyze
    m = re.fullmatch(r"(?P<body>.+?)(?<!\\)~(?P<edits>\d*)", word)
    if m:
        terms, _ = an(_unescape(m.group("body")))
        if not terms:
            return None
        edits = int(m.group("edits") or 2)
        return FuzzyQuery(terms[0], edits, boost)
    if re.search(r"(?<!\\)[*?]", word):
        if analyzer is None:
            low = word.lower()
            if re.fullmatch(r"(?:\\.|[^*?\\])+\*", low):
                return PrefixQuery(_unescape(low[:-1]), boost)
            return WildcardQuery(low, boost)  # executor honors '\' escapes
        # AnalyzingQueryParser.getWildcardQuery: split on unescaped
        # wildcard operators, analyze each fragment, reassemble
        parts = [
            p
            for p in _WILDCARD_SPLIT_RX.split(word)
            if p != ""
        ]
        out = [
            p if p in ("*", "?") else _analyze_single_chunk(p, an)
            for p in parts
        ]
        if (
            len(out) == 2
            and out[1] == "*"
            and out[0] not in ("*", "?")
        ):
            return PrefixQuery(out[0], boost)
        return WildcardQuery("".join(out), boost)
    terms, _ = an(_unescape(word))
    if not terms:
        return None  # pure stopword -> dropped clause, like Lucene
    if len(terms) == 1:
        return TermQuery(terms[0], boost)
    # a word that analyzes to several tokens (e.g. "3.x-beta") -> phrase
    return PhraseQuery(terms, 0, boost)


def parse_lucene(
    q: str, default_op: str = "OR", analyzer=None
) -> Query:
    """Parse the classic-syntax subset into a Query AST.

    ``default_op`` is Solr's q.op / QueryParser.setDefaultOperator
    (lucene/queryparser/.../classic/QueryParserBase.java addClause):
    with AND, bare terms become MUST; an explicit OR between clauses
    makes the PRECEDING required term optional again, and an explicit
    AND upgrades the preceding optional term — both directions of the
    addClause retro-fix.

    ``analyzer`` (a ``make_analyzer`` chain) switches term/phrase/fuzzy
    slots to that chain and — the AnalyzingQueryParser delta — runs
    prefix/wildcard fragments through it too (see ``parse_analyzing``)."""
    toks = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RX.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip():
                raise QueryParseError(f"cannot parse at: {q[pos:]!r}")
            break
        toks.append(m)
        pos = m.end()

    def build(i: int, depth: int) -> tuple[Query, int]:
        clauses: list[BooleanClause] = []
        pending_occur: str | None = None
        pending_op: str | None = None

        def push(sub: Query | None):
            nonlocal pending_occur, pending_op
            if sub is not None:
                if pending_occur:
                    occur = pending_occur
                elif pending_op == "AND":
                    occur = "MUST"
                elif pending_op == "OR":
                    occur = "SHOULD"
                else:
                    occur = "MUST" if default_op == "AND" else "SHOULD"
                if pending_op == "AND" and clauses and clauses[-1].occur == "SHOULD":
                    clauses[-1] = BooleanClause(clauses[-1].query, "MUST")
                if (
                    default_op == "AND"
                    and pending_op == "OR"
                    and clauses
                    and clauses[-1].occur == "MUST"
                ):
                    # QueryParserBase.addClause: under AND_OPERATOR an
                    # explicit OR makes the preceding required term
                    # optional (unless prohibited)
                    clauses[-1] = BooleanClause(clauses[-1].query, "SHOULD")
                clauses.append(BooleanClause(sub, occur))
            pending_occur = None
            pending_op = None

        while i < len(toks):
            m = toks[i]
            try:
                boost = (
                    float(m.group("boost")) if m.group("boost") else 1.0
                )
            except ValueError as e:
                # a '^' followed by a non-number is a syntax error, not
                # a crash (QueryParserBase wraps these as ParseException)
                raise QueryParseError(
                    f"bad boost {m.group('boost')!r}"
                ) from e
            if m.group("lparen"):
                sub, i = build(i + 1, depth + 1)
                if boost != 1.0:
                    sub = _boosted(sub, boost)
                push(sub)
                continue
            if m.group("rparen"):
                if depth == 0:
                    raise QueryParseError("unbalanced )")
                return _finish(clauses), i + 1
            if m.group("range"):
                inc_lo = m.group("rlb") == "["
                inc_hi = m.group("rrb") == "]"
                raw_lo = m.group("rlo")
                raw_hi = m.group("rhi")
                fld = m.group("rngfld")
                if fld and fld != "text":
                    # fielded range over a stored column: keep the raw
                    # literal case (column values are not analyzed)
                    push(
                        FieldRangeQuery(
                            fld,
                            None if raw_lo == "*" else _unescape(raw_lo),
                            None if raw_hi == "*" else _unescape(raw_hi),
                            inc_lo,
                            inc_hi,
                            boost,
                        )
                    )
                else:
                    push(
                        TermRangeQuery(
                            None
                            if raw_lo == "*"
                            else _unescape(raw_lo).lower(),
                            None
                            if raw_hi == "*"
                            else _unescape(raw_hi).lower(),
                            inc_lo,
                            inc_hi,
                            boost,
                        )
                    )
            elif m.group("phrase"):
                terms, _ = (analyzer or analyze)(
                    _unescape(m.group("phbody"))
                )
                slop = int(m.group("phslop") or 0)
                if terms:
                    push(PhraseQuery(terms, slop, boost))
                else:
                    push(None)
            elif m.group("and"):
                pending_op = "AND"
            elif m.group("or"):
                pending_op = "OR"
            elif m.group("not"):
                pending_occur = "MUST_NOT"
            elif m.group("plus"):
                pending_occur = "MUST"
            elif m.group("minus"):
                pending_occur = "MUST_NOT"
            elif m.group("star"):
                push(MatchAllQuery())
            elif m.group("fielded"):
                fld, fval = m.group("fielded"), m.group("fval")
                if fld == "text":
                    push(_word_query(fval, boost, analyzer))
                else:
                    # Solr fielded clause over a non-text column
                    # (StrField/TrieField exact match)
                    push(FieldTermQuery(fld, _unescape(fval), boost))
            elif m.group("word"):
                push(_word_query(m.group("word"), boost, analyzer))
            i += 1
        if depth != 0:
            raise QueryParseError("unbalanced (")
        return _finish(clauses), i

    query, _ = build(0, 0)
    return query


def parse_analyzing(
    q: str, analyzer, default_op: str = "OR"
) -> Query:
    """AnalyzingQueryParser (lucene/queryparser/src/java/org/apache/
    lucene/queryparser/analyzing/AnalyzingQueryParser.java:44-120):
    classic syntax, but the WILDCARD/PREFIX/FUZZY slots run their
    non-operator fragments through the supplied analyzer chain before
    dictionary expansion, instead of the classic parser's bare
    lowercase. Against an index built with a folding/stemming chain
    this is the parser that actually matches what was indexed:
    'Résumé*' -> 'resume*' under fold=True, 'tables*' -> 'table*'
    under a stemming chain. A fragment that analyzes to zero or
    several tokens raises QueryParseError, mirroring the reference's
    ParseException (analyzeSingleChunk, :141-186)."""
    return parse_lucene(q, default_op=default_op, analyzer=analyzer)


_EXT_RX = re.compile(
    r"""(?<![^\s(+\-])                    # clause boundary
        (?P<field>[A-Za-z_][A-Za-z0-9_]*)?:
        (?P<ext>[A-Za-z_][A-Za-z0-9_]*):
        (?P<val>"(?:\\.|[^"\\])*"|(?:\\.|[^\s()"^])+)""",
    re.VERBOSE,
)


def parse_extendable(
    q: str,
    extensions: dict,
    default_op: str = "OR",
    analyzer=None,
) -> Query:
    """ExtendableQueryParser (lucene/queryparser/src/java/org/apache/
    lucene/queryparser/ext/ExtendableQueryParser.java:44-120 +
    Extensions.java:121-131): a field symbol carrying the extension
    delimiter ':' splits into (indexField, extensionKey); when the key
    is registered, the raw query text for that clause is handed to the
    extension — a callable ``(field, raw_value) -> Query`` — instead of
    the classic term pipeline. ``:key:value`` (empty field part) uses
    the default field, and a key that is NOT registered leaves the
    clause to the classic parser untouched (the reference falls back to
    super.getFieldQuery). Quoted values are unquoted and unescaped
    before dispatch (the extension query part escapes specials,
    package.html example: title_customExt:"Apache Lucene\\?")."""
    placeholders: dict[str, Query] = {}

    def sub(m: re.Match) -> str:
        key = m.group("ext")
        if key not in extensions:
            return m.group(0)
        field = m.group("field") or "text"
        val = m.group("val")
        if val.startswith('"') and val.endswith('"') and len(val) >= 2:
            val = val[1:-1]
        built = extensions[key](field, _unescape(val))
        tag = f"extq{len(placeholders)}x"
        placeholders[tag] = built
        return tag

    rewritten = _EXT_RX.sub(sub, q)
    ast = parse_lucene(rewritten, default_op=default_op, analyzer=analyzer)
    if not placeholders:
        return ast

    def walk(node: Query) -> Query:
        if isinstance(node, TermQuery) and node.term in placeholders:
            return placeholders[node.term]
        if isinstance(node, BooleanQuery):
            return BooleanQuery(
                [
                    BooleanClause(walk(c.query), c.occur)
                    for c in node.clauses
                ],
                node.min_should_match,
            )
        if isinstance(node, DisMaxQuery):
            return DisMaxQuery(
                tuple(walk(c) for c in node.queries), node.tie_breaker
            )
        return node

    return walk(ast)


def _boosted(q: Query, boost: float) -> Query:
    if isinstance(q, TermQuery):
        return TermQuery(q.term, q.boost * boost)
    return q  # boost on groups: out of scope v1


def _finish(clauses: list[BooleanClause]) -> Query:
    if not clauses:
        return BooleanQuery([])
    if len(clauses) == 1 and clauses[0].occur in ("MUST", "SHOULD"):
        return clauses[0].query
    return BooleanQuery(clauses)


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """Solr mm spec grammar — transliterated from
    solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:533-569
    (calculateMinShouldMatch): plain int, negative int (n fewer than
    all), percentage (float32 product, truncated toward zero; negative
    percentages subtract), and space-separated conditional clauses
    'bound<spec' applied for optionalClauseCount > bound."""
    import numpy as np

    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        spec = re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
        for s in spec.split(" "):
            parts = s.split("<")
            upper_bound = int(parts[0])
            if optional_clause_count <= upper_bound:
                return result
            result = calculate_min_should_match(
                optional_clause_count, parts[1]
            )
        return result
    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = float(
            np.float32(result * percent) * (np.float32(1) / np.float32(100))
        )
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return (
        optional_clause_count
        if optional_clause_count < result
        else (0 if result < 0 else result)
    )


def _resolve_mm(mm: int | str, q: Query) -> int:
    if isinstance(mm, int):
        return mm
    n_opt = (
        sum(1 for c in q.clauses if c.occur == "SHOULD")
        if isinstance(q, BooleanQuery)
        else 0
    )
    return calculate_min_should_match(n_opt, mm)


def parse_edismax(
    user_query: str, tie: float = 0.0, mm: int | str = 0
) -> Query:
    """ExtendedDismaxQParserPlugin.java behavior subset: full lucene
    syntax (incl. fielded clauses ``field:value``, boosts, phrases,
    +/-) with edismax's signature GRACEFUL DEGRADATION — if the query
    does not parse as lucene syntax, fall back to treating it as a
    plain dismax bag of words (escaping the operators)."""
    try:
        q = parse_lucene(user_query)
    except QueryParseError:
        return parse_dismax(
            re.sub(r'[()+\-"^\[\]]', " ", user_query), tie, mm
        )
    if mm and isinstance(q, BooleanQuery) and q.min_should_match == 0:
        q = BooleanQuery(q.clauses, min_should_match=_resolve_mm(mm, q))
    return q


def parse_dismax(
    user_query: str, tie: float = 0.0, mm: int | str = 0
) -> Query:
    """DisMaxQParser.java: each whitespace-separated word becomes a
    DisMax over the query fields (we have one indexed field, so the
    per-word DisMax degenerates to its single TermQuery, exactly as Solr
    with qf=text), all combined as SHOULD with minimum-should-match."""
    words = user_query.split()
    per_word: list[Query] = []
    for w in words:
        terms, _ = analyze(w)
        if terms:
            per_word.append(DisMaxQuery([TermQuery(terms[0])], tie))
    return BooleanQuery(
        [BooleanClause(q, "SHOULD") for q in per_word],
        min_should_match=(
            mm
            if isinstance(mm, int)
            else calculate_min_should_match(len(per_word), mm)
        ),
    )
