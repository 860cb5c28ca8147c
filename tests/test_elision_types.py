"""ElisionFilter, TypeTokenFilter, and PositionFilter semantics.

Reference:
  - lucene/analysis/common/src/java/org/apache/lucene/analysis/util/
    ElisionFilter.java:52-74 (strip article prefix at the FIRST
    apostrophe; CharArraySet lookup is case-insensitive) and
    fr/FrenchAnalyzer.java:102-104 (DEFAULT_ARTICLES l,m,t,qu,n,s,j).
  - lucene/analysis/common/src/java/org/apache/lucene/analysis/core/
    TypeTokenFilter.java:30-55 (FilteringTokenFilter on the type
    attribute; useWhiteList keeps instead of drops) and standard/
    StandardTokenizer.java:60-97 (type constants).
  - lucene/analysis/common/src/java/org/apache/lucene/analysis/
    position/PositionFilter.java:58-76 (first token keeps its
    increment, later tokens get the configured one).
"""

import pytest

from lucene_solr_spark.analysis.tokenizer import (
    FRENCH_ARTICLES,
    elide_token,
    make_analyzer,
    token_type,
)


# ---- ElisionFilter --------------------------------------------------

def test_elide_french_defaults():
    # TestElision.java's canonical example sentence tokens
    assert elide_token("l'avion", FRENCH_ARTICLES) == "avion"
    assert elide_token("qu'il", FRENCH_ARTICLES) == "il"
    assert elide_token("j'aime", FRENCH_ARTICLES) == "aime"
    assert elide_token("m'appelle", FRENCH_ARTICLES) == "appelle"


def test_elide_non_article_prefix_passes_through():
    assert elide_token("don't", FRENCH_ARTICLES) == "don't"
    assert elide_token("avion", FRENCH_ARTICLES) == "avion"


def test_elide_first_apostrophe_only():
    # the FIRST apostrophe decides; the rest of the token is kept
    # verbatim including later apostrophes
    assert elide_token("l'avion's", FRENCH_ARTICLES) == "avion's"
    # prefix before the first apostrophe not an article -> unchanged
    # even though a later split would match
    assert elide_token("xx'l'y", FRENCH_ARTICLES) == "xx'l'y"


def test_elide_case_insensitive_and_unicode_apostrophe():
    assert elide_token("L’avion", FRENCH_ARTICLES) == "avion"


def test_elision_in_chain_positions_preserved():
    an = make_analyzer(elision=True, stop=False)
    terms, pos = an("l'avion qu'il aime")
    assert terms == ["avion", "il", "aime"]
    assert pos == [0, 1, 2]


def test_elision_runs_before_stop_filter():
    # "that's" with article "that" elides to "s"; a stop set holding
    # "s" then removes it WITH a position gap (reference order:
    # Elision -> LowerCase -> Stop, FrenchAnalyzer.java:194-196)
    an = make_analyzer(
        elision=frozenset({"that"}), stop_words=frozenset({"s"})
    )
    terms, pos = an("that's fine")
    assert terms == ["fine"]
    assert pos == [1]


# ---- TypeTokenFilter ------------------------------------------------

def test_token_type_classification():
    assert token_type("42") == "<NUM>"
    assert token_type("3.5") == "<NUM>"
    assert token_type("1'000") == "<NUM>"
    assert token_type("abc") == "<ALPHANUM>"
    assert token_type("abc123") == "<ALPHANUM>"
    assert token_type("3.5x") == "<ALPHANUM>"


def test_stop_types_drops_with_position_gap():
    an = make_analyzer(stop_types=frozenset({"<NUM>"}), stop=False)
    terms, pos = an("call 911 now")
    assert terms == ["call", "now"]
    assert pos == [0, 2]


def test_keep_types_whitelist():
    an = make_analyzer(keep_types=frozenset({"<NUM>"}), stop=False)
    terms, pos = an("call 911 now or 3.5 times")
    assert terms == ["911", "3.5"]
    assert pos == [1, 4]


def test_stop_and_keep_types_mutually_exclusive():
    with pytest.raises(ValueError):
        make_analyzer(
            stop_types=frozenset({"<NUM>"}),
            keep_types=frozenset({"<NUM>"}),
        )


def test_type_assigned_by_tokenizer_not_downstream():
    # the type attribute is assigned by the tokenizer; a downstream
    # mutation (pattern_replace digit-strip) must not re-type the token
    an = make_analyzer(
        stop_types=frozenset({"<NUM>"}),
        pattern_replace=(r"\d", "n"),
        stop=False,
    )
    terms, _ = an("abc 42 x9")
    # "42" is dropped as <NUM> before the replace; "x9" is ALPHANUM so
    # it survives and is then rewritten
    assert terms == ["abc", "xn"]


# ---- PositionFilter -------------------------------------------------

def test_position_filter_flattens_to_first_position():
    # stop gap before the first kept token: its original position
    # survives (the first token keeps its increment)
    an = make_analyzer(position_increment=0)
    terms, pos = an("the quick brown fox")
    assert terms == ["quick", "brown", "fox"]
    assert pos == [1, 1, 1]


def test_position_filter_fixed_increment():
    an = make_analyzer(position_increment=5, stop=False)
    terms, pos = an("a b c")
    assert pos == [0, 5, 10]


def test_position_filter_empty_stream():
    an = make_analyzer(position_increment=0)
    assert an("") == ([], [])


# ---- ReverseStringFilter --------------------------------------------

def test_reverse_tokens():
    # ReverseStringFilter.java:48-80
    an = make_analyzer(reverse_tokens=True, stop=False)
    terms, pos = an("apache lucene")
    assert terms == ["ehcapa", "enecul"]
    assert pos == [0, 1]


def test_reverse_tokens_with_marker():
    # the \u0001 START_OF_HEADING marker ReversedWildcardFilter uses
    an = make_analyzer(
        reverse_tokens=True, reverse_marker="\u0001", stop=False
    )
    terms, _ = an("abc")
    assert terms == ["\u0001cba"]
