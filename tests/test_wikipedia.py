"""WikipediaTokenizer pinned to the reference's own test vectors
(lucene/analysis/common/src/test/org/apache/lucene/analysis/wikipedia/
WikipediaTokenizerTest.java:41-162)."""

from lucene_solr_spark.analysis.wikipedia import (
    BOLD,
    BOLD_ITALICS,
    BOTH,
    CATEGORY,
    CITATION,
    EXTERNAL_LINK,
    EXTERNAL_LINK_URL,
    HEADING,
    INTERNAL_LINK,
    ITALICS,
    SUB_HEADING,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    UNTOKENIZED_TOKEN_FLAG,
    ALPHANUM,
    APOSTROPHE,
    NUM,
    wikipedia_tokenize,
)

LINK_PHRASES = (
    "click [[link here again]] click "
    "[http://lucene.apache.org here again] [[Category:a b c d]]"
)


def _terms(toks):
    return [t.term for t in toks]


def _types(toks):
    return [t.type for t in toks]


def _incs(toks):
    return [t.pos_inc for t in toks]


def test_simple():
    # WikipediaTokenizerTest.testSimple
    toks = wikipedia_tokenize("This is a [[Category:foo]]")
    assert _terms(toks) == ["This", "is", "a", "foo"]
    assert _types(toks) == [ALPHANUM, ALPHANUM, ALPHANUM, CATEGORY]
    assert _incs(toks) == [1, 1, 1, 1]


def test_link_phrases():
    # WikipediaTokenizerTest.checkLinkPhrases
    toks = wikipedia_tokenize(LINK_PHRASES)
    assert _terms(toks) == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c",
        "d",
    ]
    assert _incs(toks) == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_links():
    # WikipediaTokenizerTest.testLinks
    text = (
        "[http://lucene.apache.org/java/docs/index.html#news here]"
        " [http://lucene.apache.org/java/docs/index.html?b=c here]"
        " [https://lucene.apache.org/java/docs/index.html?b=c here]"
    )
    toks = wikipedia_tokenize(text)
    assert _terms(toks) == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here",
    ]
    assert _types(toks) == [
        EXTERNAL_LINK_URL, EXTERNAL_LINK,
        EXTERNAL_LINK_URL, EXTERNAL_LINK,
        EXTERNAL_LINK_URL, EXTERNAL_LINK,
    ]


def test_lucene_1133_tokens_only_ignores_untoks():
    # untokenized set has no effect in TOKENS_ONLY mode
    toks = wikipedia_tokenize(
        LINK_PHRASES, TOKENS_ONLY, frozenset({CATEGORY, ITALICS})
    )
    assert _terms(toks)[:5] == ["click", "link", "here", "again",
                                "click"]
    assert _incs(toks) == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


UNTOK_TEST = (
    "[[Category:a b c d]] [[Category:e f g]] [[link here]] "
    "[[link there]] ''italics here'' something ''more italics'' "
    "[[Category:h   i   j]]"
)


def test_untokenized_only():
    # WikipediaTokenizerTest.testLucene1133 (UNTOKENIZED_ONLY)
    toks = wikipedia_tokenize(
        UNTOK_TEST, UNTOKENIZED_ONLY, frozenset({CATEGORY, ITALICS})
    )
    assert _terms(toks) == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j",
    ]
    assert _incs(toks) == [1] * 10


def test_both():
    # WikipediaTokenizerTest.testBoth
    toks = wikipedia_tokenize(
        UNTOK_TEST, BOTH, frozenset({CATEGORY, ITALICS})
    )
    assert _terms(toks) == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g",
        "link", "here", "link", "there", "italics here", "italics",
        "here", "something", "more italics", "more", "italics",
        "h   i   j", "h", "i", "j",
    ]
    assert _incs(toks) == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1,
        1, 0, 1, 1,
    ]
    assert [t.flags for t in toks] == [
        UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG,
        0, 0, 0, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
        UNTOKENIZED_TOKEN_FLAG, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
    ]


def test_handwritten():
    # WikipediaTokenizerTest.testHandwritten — the full kitchen sink
    test = (
        "[[link]] This is a [[Category:foo]] Category  This is a "
        "linked [[:Category:bar none withstanding]] "
        "Category This is (parens) This is a [[link]]  This is an "
        "external URL [http://lucene.apache.org] "
        "Here is ''italics'' and ''more italics'', '''bold''' and "
        "'''''five quotes''''' "
        " This is a [[link|display info]]  This is a period.  Here is "
        "$3.25 and here is 3.50.  Here's Johnny.  "
        "==heading== ===sub head=== followed by some text  "
        "[[Category:blah| ]] "
        "''[[Category:ital_cat]]''  here is some that is ''italics "
        "[[Category:foo]] but is never closed."
        "'''same [[Category:foo]] goes for this '''''and2 "
        "[[Category:foo]] and this"
        " [http://foo.boo.com/test/test/ Test Test] "
        "[http://foo.boo.com/test/test/test.html Test Test]"
        " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
        '<ref>Citation</ref> <sup>martian</sup> <span class="glue">'
        "code</span>"
    )
    toks = wikipedia_tokenize(test)
    assert _terms(toks) == [
        "link", "This", "is", "a", "foo", "Category", "This", "is",
        "a", "linked", "bar", "none", "withstanding", "Category",
        "This", "is", "parens", "This", "is", "a", "link", "This",
        "is", "an", "external", "URL", "http://lucene.apache.org",
        "Here", "is", "italics", "and", "more", "italics", "bold",
        "and", "five", "quotes", "This", "is", "a", "link", "display",
        "info", "This", "is", "a", "period", "Here", "is", "3.25",
        "and", "here", "is", "3.50", "Here's", "Johnny", "heading",
        "sub", "head", "followed", "by", "some", "text", "blah",
        "ital", "cat", "here", "is", "some", "that", "is", "italics",
        "foo", "but", "is", "never", "closed", "same", "foo", "goes",
        "for", "this", "and2", "foo", "and", "this",
        "http://foo.boo.com/test/test/", "Test", "Test",
        "http://foo.boo.com/test/test/test.html", "Test", "Test",
        "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test",
        "Test", "Citation", "martian", "code",
    ]
    assert _types(toks) == [
        INTERNAL_LINK, ALPHANUM, ALPHANUM, ALPHANUM, CATEGORY,
        ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM, CATEGORY,
        CATEGORY, CATEGORY, ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM,
        ALPHANUM, ALPHANUM, ALPHANUM, INTERNAL_LINK, ALPHANUM,
        ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM, EXTERNAL_LINK_URL,
        ALPHANUM, ALPHANUM, ITALICS, ALPHANUM, ITALICS, ITALICS,
        BOLD, ALPHANUM, BOLD_ITALICS, BOLD_ITALICS, ALPHANUM,
        ALPHANUM, ALPHANUM, INTERNAL_LINK, INTERNAL_LINK,
        INTERNAL_LINK, ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM,
        ALPHANUM, ALPHANUM, NUM, ALPHANUM, ALPHANUM, ALPHANUM, NUM,
        APOSTROPHE, ALPHANUM, HEADING, SUB_HEADING, SUB_HEADING,
        ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM, CATEGORY, CATEGORY,
        CATEGORY, ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM,
        ITALICS, CATEGORY, ALPHANUM, ALPHANUM, ALPHANUM, ALPHANUM,
        BOLD, CATEGORY, ALPHANUM, ALPHANUM, ALPHANUM, BOLD_ITALICS,
        CATEGORY, ALPHANUM, ALPHANUM, EXTERNAL_LINK_URL,
        EXTERNAL_LINK, EXTERNAL_LINK, EXTERNAL_LINK_URL,
        EXTERNAL_LINK, EXTERNAL_LINK, EXTERNAL_LINK_URL,
        EXTERNAL_LINK, EXTERNAL_LINK, CITATION, ALPHANUM, ALPHANUM,
    ]
