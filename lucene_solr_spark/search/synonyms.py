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
                BooleanClause(
                    PhraseQuery(v.split(" "), 0, q.boost)
                    if " " in v
                    else TermQuery(v, q.boost),
                    "SHOULD",
                )
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


# ---------------------------------------------------------------------------
# Synonym file parsers — SolrSynonymParser / WordnetSynonymParser
# (lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
# {SolrSynonymParser,WordnetSynonymParser}.java)
# ---------------------------------------------------------------------------


def _default_analyze(s: str) -> str:
    """Analyzer slot default: lowercase, collapse token separators to
    single spaces (multi-token sides join on SynonymMap.WORD_SEPARATOR
    in the reference; space here)."""
    import re

    toks = re.findall(r"[0-9A-Za-z_]+", s.lower())
    return " ".join(toks)


def _unescape(s: str) -> str:
    """SolrSynonymParser.unescape: backslash removes special meaning of
    the NEXT char (\\, => escaping, comma escaping)."""
    out = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _split_unescaped(s: str, sep: str) -> list[str]:
    """SolrSynonymParser.split: split on sep outside backslash escapes."""
    parts: list[str] = []
    buf: list[str] = []
    i = 0
    while i < len(s):
        if s.startswith(sep, i):
            parts.append("".join(buf))
            buf = []
            i += len(sep)
        elif s[i] == "\\" and i + 1 < len(s):
            buf.append(s[i])
            buf.append(s[i + 1])
            i += 2
        else:
            buf.append(s[i])
            i += 1
    parts.append("".join(buf))
    return parts


def parse_solr_synonyms(
    text: str, expand: bool = True, analyze=None
) -> dict[str, list[str]]:
    """SolrSynonymParser.addInternal: '#'/blank lines are comments;
    'a, b => c, d' maps every LHS alternative to every RHS alternative
    (expand ignored); 'a, b, c' is an equivalence class — all-pairs
    when expand, else everything maps to the first entry. Multiple
    rules for one input merge. Returns input -> sorted outputs."""
    an = analyze or _default_analyze
    out: dict[str, set[str]] = {}

    def add(inp: str, o: str) -> None:
        if inp and o:
            out.setdefault(inp, set()).add(o)

    for raw in text.splitlines():
        line = raw
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        sides = [p for p in _split_unescaped(line, "=>")]
        if len(sides) > 2:
            raise ValueError(
                "more than one explicit mapping specified on the "
                "same line: " + raw
            )
        if len(sides) == 2:
            inputs = [
                an(_unescape(p).strip())
                for p in _split_unescaped(sides[0], ",")
            ]
            outputs = [
                an(_unescape(p).strip())
                for p in _split_unescaped(sides[1], ",")
            ]
        else:
            inputs = [
                an(_unescape(p).strip())
                for p in _split_unescaped(line, ",")
            ]
            outputs = inputs if expand else inputs[:1]
        for i in inputs:
            for o in outputs:
                add(i, o)
    return {k: sorted(v) for k, v in out.items()}


def parse_wordnet_synonyms(
    text: str, expand: bool = True, analyze=None
) -> dict[str, list[str]]:
    """WordnetSynonymParser.add: prolog lines
    s(100001740,1,'entity',n,1,11). — synset id is chars [2, 11); the
    word sits between the first and last single quote with '' as the
    quote escape; consecutive same-id lines form one synset, all-pairs
    when expand else mapped to the synset head."""
    an = analyze or _default_analyze
    out: dict[str, set[str]] = {}

    def add_synset(synset: list[str]) -> None:
        if len(synset) <= 1:
            return
        if expand:
            for a in synset:
                for b in synset:
                    out.setdefault(a, set()).add(b)
        else:
            for a in synset:
                out.setdefault(a, set()).add(synset[0])

    synset: list[str] = []
    last_id = ""
    for line in text.splitlines():
        if not line.strip():
            continue
        syn_id = line[2:11]
        if syn_id != last_id:
            add_synset(synset)
            synset = []
        start = line.index("'") + 1
        end = line.rindex("'")
        word = line[start:end].replace("''", "'")
        synset.append(an(word))
        last_id = syn_id
    add_synset(synset)
    return {k: sorted(v) for k, v in out.items()}
