"""HyphenationCompoundWordTokenFilter parity
(lucene/analysis/common/src/java/org/apache/lucene/analysis/compound/
HyphenationCompoundWordTokenFilter.java:168-236;
hyphenation/HyphenationTree.java:315-405). All expectations below are
hand-derived from Liang's published algorithm on synthetic patterns —
every digit placement is small enough to walk on paper."""

from lucene_solr_spark.analysis.hyphenation import (
    HyphenationTree,
    make_hyphenation_compound_filter,
)


def tree(pats, exc=None):
    return HyphenationTree(pats, exc)


# ---- Liang pattern mechanics ----------------------------------------


def test_break_where_max_digit_is_odd():
    # '1ta': odd weight before every 'ta' occurrence
    t = tree(["1ta"])
    # .datatable. -> 'ta' at letter idx 2 and 4
    assert t.hyphenate("datatable") == [2, 4]


def test_even_digit_suppresses_break():
    # '2ta' alone: even -> never a break
    assert tree(["2ta"]).hyphenate("datatable") is None
    # max(1, 2) = 2 at the same boundary -> suppressed
    assert tree(["1ta", "2ta"]).hyphenate("datatable") is None


def test_digit_between_letters():
    # 'a1t': break between 'a' and 't'
    assert tree(["a1t"]).hyphenate("datatable") == [2, 4]


def test_dot_anchors_word_start_and_end():
    # '.da1': only at word start -> one break after 'da'
    assert tree([".da1"]).hyphenate("datatable") == [2]
    # 'b1le.' anchors the end; remain/push bounds keep idx 7 legal
    assert tree(["b1le."]).hyphenate("datatable") == [7]


def test_remain_and_push_char_bounds():
    # would-be break before letter 0 (remainCharCount=1 excludes it)
    assert tree(["1da"]).hyphenate("datatable") is None
    # would-be break after the last letter (pushCharCount=1 excludes)
    assert tree(["le1"]).hyphenate("datatable") is None


def test_non_letter_and_short_words_return_none():
    t = tree(["1ta"])
    assert t.hyphenate("src0table") is None  # digit mid-word (:327-338)
    assert t.hyphenate("a") is None  # len < remain+push (:346-348)


def test_exception_word_bypasses_patterns():
    # stoplist path (:354-368): explicit breaks win over patterns
    t = tree(["1ta"], exc=["data-table"])
    assert t.hyphenate("datatable") == [4]
    assert t.hyphenate("tatatable") == [2, 4]  # non-exception: patterns


# ---- decompose() over the points ------------------------------------


def run_filter(t, dictionary=None, **kw):
    f = make_hyphenation_compound_filter(t, dictionary, **kw)

    def on(word):
        terms, pos = f([word], [0])
        assert terms[0] == word and pos == [0] * len(terms)
        return terms[1:]

    return on


def test_no_dictionary_emits_every_fitting_point_pair():
    on = run_filter(tree(["1ta"]))
    # hyp = [0, 2, 4, 9]; all pairs within [2, 15]
    assert on("datatable") == [
        "da", "data", "datatable", "ta", "tatable", "table",
    ]


def test_dictionary_filters_subwords():
    on = run_filter(tree(["1ta"]), {"data", "table"})
    assert on("datatable") == ["data", "table"]


def test_one_char_shorter_dictionary_recheck():
    # (0,4)='data' not in dict, but 'dat' is -> the genitive-'s'
    # branch emits the one-shorter word (reference :203-229)
    on = run_filter(tree(["1ta"]), {"dat", "table"})
    assert on("datatable") == ["dat", "table"]


def test_only_longest_match_keeps_one_per_start():
    on = run_filter(
        tree(["1ta"]), {"da", "data", "table"}, only_longest_match=True
    )
    assert on("datatable") == ["data", "table"]


def test_min_word_size_gate_and_no_points_no_subwords():
    on = run_filter(tree(["1ta"]), min_word_size=5)
    assert on("data") == []  # len 4 < minWordSize: never decomposed
    assert on("zzzzzz") == []  # no hyphenation points -> nothing


def test_subword_size_bounds():
    # min_subword_size=3 drops 'da'/'ta'; max_subword_size=6 stops the
    # scan past 'datata'-sized parts (break, not continue — reference)
    on = run_filter(
        tree(["1ta"]), min_subword_size=3, max_subword_size=6
    )
    assert on("datatable") == ["data", "table"]


def test_positions_are_pos_increment_zero():
    f = make_hyphenation_compound_filter(tree(["1ta"]), {"data"})
    terms, pos = f(["datatable", "other"], [3, 7])
    assert terms == ["datatable", "data", "other"]
    assert pos == [3, 3, 7]


def test_analyzer_slot_integration():
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(
        hyphenator=tree(["1scan"]),
        compound=frozenset({"en", "scan"}),
        stop=False,
    )
    terms, pos = an("enscan plain")
    assert terms == ["enscan", "en", "scan", "plain"]
    assert pos == [0, 0, 0, 1]
