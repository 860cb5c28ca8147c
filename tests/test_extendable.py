"""ExtendableQueryParser (lucene/queryparser/src/java/org/apache/
lucene/queryparser/ext/ExtendableQueryParser.java:44-120,
Extensions.java:121-131): extension keys encoded into the field symbol
dispatch the clause's raw text to a registered ParserExtension; an
unregistered key or plain field falls back to classic parsing."""

from lucene_solr_spark.search.qparser import parse_extendable, parse_lucene
from lucene_solr_spark.search.query import (
    BooleanQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)


def EXT():
    return {
        "prefix": lambda field, v: PrefixQuery(v.lower()),
        "wild": lambda field, v: WildcardQuery(v.lower()),
        "fld": lambda field, v: TermQuery(f"{field}${v}"),
    }


def test_extension_clause_dispatches():
    q = parse_extendable("text:prefix:sc", EXT())
    assert q == PrefixQuery("sc")


def test_empty_field_part_uses_default_field():
    # ':key:value' -> default field (ExtendableQueryParser javadoc:
    # '_customExt:"Apache Lucene\?"' searches the default field)
    q = parse_extendable(":fld:abc", EXT())
    assert q == TermQuery("text$abc")


def test_field_part_reaches_extension():
    q = parse_extendable("title:fld:abc", EXT())
    assert q == TermQuery("title$abc")


def test_unregistered_key_falls_back_to_classic():
    # 'lang:en' has no extension key -> classic fielded clause,
    # byte-identical to parse_lucene
    assert parse_extendable("lang:en scan", EXT()) == parse_lucene(
        "lang:en scan"
    )


def test_mixes_with_boolean_context():
    q = parse_extendable("+text:prefix:sc merge", EXT(), default_op="OR")
    assert isinstance(q, BooleanQuery)
    occurs = {(c.query, c.occur) for c in q.clauses}
    assert (PrefixQuery("sc"), "MUST") in occurs
    assert (TermQuery("merge"), "SHOULD") in occurs


def test_quoted_value_unquoted_and_unescaped():
    got = {}

    def grab(field, v):
        got["v"] = v
        return TermQuery("x")

    parse_extendable('text:raw:"a b\\?"', {"raw": grab})
    assert got["v"] == "a b?"


def test_escaped_value_unescaped():
    q = parse_extendable(r"text:wild:sc\*n*", EXT())
    # the extension receives the raw value with escapes discarded
    assert q == WildcardQuery("sc*n*")


def test_end_to_end_prefix_extension(spark, small_index):
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import PrefixQuery as PQ

    s = Searcher(small_index)
    ext_q = parse_extendable("text:prefix:sc", EXT())
    want = (
        s.score(PQ("sc")).select("doc_id").distinct().count()
    )
    got = s.score(ext_q).select("doc_id").distinct().count()
    assert got == want > 0
