"""Metaphone + Double Metaphone encoders and the DoubleMetaphoneFilter
slot — pinned by the reference's own DoubleMetaphoneFilterTest vectors
(lucene/analysis/phonetic/src/test/.../DoubleMetaphoneFilterTest.java)
plus the published commons-codec/Philips examples."""

from lucene_solr_spark.analysis.phonetic import (
    double_metaphone,
    make_double_metaphone_filter,
    make_phonetic_filter,
    metaphone,
)


def test_metaphone_published_vectors():
    # the commons-codec javadoc sentence + classic single-word pins
    assert [
        metaphone(w)
        for w in "The quick brown fox jumped over the lazy dogs".split()
    ] == ["0", "KK", "BRN", "FKS", "JMPT", "OFR", "0", "LS", "TKS"]
    assert metaphone("howl") == "HL"
    assert metaphone("testing") == "TSTN"
    assert metaphone("Knight") == "NT"      # KN- + silent GH
    assert metaphone("Xavier") == "SFR"     # X- sounds as S
    assert metaphone("PHISH") == "FX"       # PH -> F, SH -> X
    assert metaphone("school") == "SKL"     # SCH -> K
    assert metaphone("science") == "SNS"    # SC before front vowel
    assert metaphone("lamb") == "LM"        # silent trailing B
    assert metaphone("") == ""
    assert metaphone("a") == "A"


def test_double_metaphone_reference_filter_vectors():
    # DoubleMetaphoneFilterTest.java:36-55
    assert double_metaphone("international") == ("ANTR", "ANTR")
    assert double_metaphone("international", 8) == (
        "ANTRNXNL",
        "ANTRNXNL",
    )
    assert double_metaphone("Kuczewski") == ("KSSK", "KXFS")
    assert double_metaphone("hello", 8) == ("HL", "HL")


def test_double_metaphone_published_vectors():
    assert double_metaphone("smith") == ("SM0", "XMT")
    assert double_metaphone("schmidt") == ("XMT", "SMT")
    assert double_metaphone("snider") == ("SNTR", "XNTR")
    assert double_metaphone("testing") == ("TSTN", "TSTN")
    assert double_metaphone("jumped") == ("JMPT", "AMPT")
    assert double_metaphone("The") == ("0", "T")
    assert double_metaphone("over") == ("AFR", "AFR")
    assert double_metaphone("") == ("", "")
    assert double_metaphone("12345") == ("", "")


def test_double_metaphone_filter_emit_semantics():
    # inject=false: encode, alternate when it differs, pass through
    # tokens that produce no encoding (DoubleMetaphoneFilterTest's
    # '12345' / '#$%@#^%&' cases)
    f = make_double_metaphone_filter(inject=False)
    terms, pos = f(["international"], [0])
    assert (terms, pos) == (["ANTR"], [0])
    terms, pos = f(["kuczewski"], [0])
    assert (terms, pos) == (["KSSK", "KXFS"], [0, 0])
    terms, pos = f(["12345", "#$%@#^%&", "hello"], [0, 1, 2])
    assert (terms, pos) == (["12345", "#$%@#^%&", "HL"], [0, 1, 2])
    # inject=true keeps the original first at the same position
    f = make_double_metaphone_filter(inject=True)
    terms, pos = f(["international"], [3])
    assert (terms, pos) == (["international", "ANTR"], [3, 3])


def test_metaphone_through_phonetic_filter_slot():
    f = make_phonetic_filter("metaphone", inject=False)
    terms, pos = f(["testing", "knight"], [0, 1])
    assert (terms, pos) == (["TSTN", "NT"], [0, 1])
