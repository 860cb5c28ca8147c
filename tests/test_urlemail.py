"""UAX29URLEmailTokenizer subset — URL/email single-token emission.

Pinned where the reference's own vectors fall inside the implemented
subset (TestUAX29URLEmailTokenizer.java:357-360 mailto, 208-212
alphanumeric SA vectors, 189-193 empty).
"""

from lucene_solr_spark.analysis.tokenizer import (
    make_analyzer,
    tokenize_url_email_typed,
)


def test_mailto_reference_vector():
    # TestUAX29URLEmailTokenizer.java:358-360
    terms, types = tokenize_url_email_typed("mailto:test@example.org")
    assert terms == ["mailto", "test@example.org"]
    assert types == ["<ALPHANUM>", "<EMAIL>"]


def test_alphanumeric_sa_vectors():
    # TestUAX29URLEmailTokenizer.java testAlphanumericSA
    assert tokenize_url_email_typed("B2B")[0] == ["B2B"]
    assert tokenize_url_email_typed("2B")[0] == ["2B"]


def test_empty():
    for s in ("", ".", " "):
        assert tokenize_url_email_typed(s) == ([], [])


def test_url_forms():
    terms, types = tokenize_url_email_typed(
        "visit https://example.org/a/b?c=d or www.apache.org "
        "or ftp://files.example.com/pub now"
    )
    assert terms == [
        "visit", "https://example.org/a/b?c=d", "or",
        "www.apache.org", "or", "ftp://files.example.com/pub", "now",
    ]
    assert types == [
        "<ALPHANUM>", "<URL>", "<ALPHANUM>", "<URL>", "<ALPHANUM>",
        "<URL>", "<ALPHANUM>",
    ]


def test_email_with_dots_and_plus():
    terms, types = tokenize_url_email_typed(
        "first.last+tag@sub.example.co contacted us"
    )
    assert terms[0] == "first.last+tag@sub.example.co"
    assert types[0] == "<EMAIL>"


def test_analyzer_chain_lowercases_whole_tokens():
    an = make_analyzer(tokenizer="url_email", lowercase=True,
                       stop=False)
    terms, pos = an("Email ME@Example.COM today")
    assert terms == ["email", "me@example.com", "today"]
    assert pos == [0, 1, 2]
