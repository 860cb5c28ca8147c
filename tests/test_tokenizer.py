"""Golden tokenization fixtures (FIXTURES.md §2) pinning the analyzer:
StandardTokenizer-approx grammar, LowerCaseFilter, 33-word StopFilter with
position-increment gaps, dl = surviving token count."""

from lucene_solr_spark.analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    analyze,
    make_analyzer,
    tokenize_raw,
)

GOLDEN = [
    # (text, [(term, position), ...])
    ("hello world", [("hello", 0), ("world", 1)]),
    ("Hello WORLD", [("hello", 0), ("world", 1)]),
    # stopword removal with position gap (FilteringTokenFilter.java:49-57)
    ("the quick brown fox", [("quick", 1), ("brown", 2), ("fox", 3)]),
    (
        "error in the cache layer",
        [("error", 0), ("cache", 3), ("layer", 4)],
    ),
    # punctuation splits
    ("foo,bar;baz!", [("foo", 0), ("bar", 1), ("baz", 2)]),
    # numbers and decimal join (UAX#29 MidNum)
    ("code 404 and 3.14 returned", [("code", 0), ("404", 1), ("3.14", 3), ("returned", 4)]),
    # apostrophe join (MidLetter) and underscore join (ExtendNumLet)
    ("don't touch foo_bar", [("don't", 0), ("touch", 1), ("foo_bar", 2)]),
    # whitespace robustness
    ("  leading   and   trailing  ", [("leading", 0), ("trailing", 2)]),
    ("", []),
    # all-stopword turn -> dl = 0
    ("the of and to a in is it", []),
    # trailing period not joined
    ("end.", [("end", 0)]),
    ("a.b stays", [("a.b", 0), ("stays", 1)]),
]


def test_stopword_set_is_the_lucene_33():
    # StopAnalyzer.java:52-57
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"the", "a", "will", "with", "such", "into"} <= ENGLISH_STOP_WORDS
    assert "you" not in ENGLISH_STOP_WORDS


def test_golden_tokens():
    for text, want in GOLDEN:
        terms, positions = analyze(text)
        assert list(zip(terms, positions)) == want, text


def test_dl_counts_survivors_only():
    terms, _ = analyze("the error of the error in cache")
    assert len(terms) == 3  # error, error, cache


def test_max_token_length_dropped():
    long_tok = "x" * 256
    assert tokenize_raw(f"short {long_tok} after") == ["short", "after"]
    ok_tok = "y" * 255
    assert ok_tok in tokenize_raw(ok_tok)


def test_make_analyzer_chain_variants():
    from lucene_solr_spark.analysis.tokenizer import analyze, make_analyzer

    text = "The running Café servers are failing quickly"
    # default chain == analyze
    assert make_analyzer()(text) == analyze(text)
    # stemming preserves positions, stems surviving tokens
    # (the ASCII-pinned grammar truncates unfolded 'café' to 'caf')
    terms, pos = make_analyzer(stem=True)(text)
    assert terms == ["run", "caf", "server", "fail", "quickli"]
    _, pos_plain = analyze(text)
    assert pos == pos_plain
    # folding normalizes before tokenization
    terms_f, _ = make_analyzer(fold=True)(text)
    assert "cafe" in terms_f
    # no stop filter keeps everything (dl semantics change accordingly)
    terms_ns, pos_ns = make_analyzer(stop=False)(text)
    assert "the" in terms_ns and pos_ns == list(range(len(terms_ns)))


def test_index_with_stemming_analyzer(spark, tiny_pdf):
    """End-to-end custom-Analyzer slot: an index built with the stemming
    chain matches stem queries across inflections."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import TermQuery

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "servers failing quickly",
                "the server failed",
                "nothing relevant here",
            ],
        }
    )
    sdf = spark.createDataFrame(pdf)
    idx = build_index(spark, sdf, analyzer=make_analyzer(stem=True))
    s = Searcher(idx)
    hits = {r["doc_id"] for r in s.search(TermQuery("fail"), 10).collect()}
    assert hits == {0, 1}
    assert idx.term_stats(["server"])["server"][0] == 2  # df across inflections


def test_shingle_filter_in_analyzer_slot():
    """ShingleFilter chain semantics (ShingleFilter.java): '_' fillers
    occupy stop-filter holes, shingles anchor at every slot (incl.
    filler slots) up to the last real token, all-filler grams skipped,
    unigrams only for real tokens, outputs share the anchor position."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(shingle=(2, 2))
    terms, positions = an("please divide this sentence into shingles")
    # raw: please(0) divide(1) this(2)* sentence(3) into(4)* shingles(5)
    assert list(zip(terms, positions)) == [
        ("please", 0),
        ("please divide", 0),
        ("divide", 1),
        ("divide _", 1),
        ("_ sentence", 2),
        ("sentence", 3),
        ("sentence _", 3),
        ("_ shingles", 4),
        ("shingles", 5),
    ]


def test_shingle_chain_order_and_options():
    """Chain order: stop THEN stem THEN shingle; unigram suppression;
    min/max sizes; leading stop holes become leading fillers."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(stem=True, shingle=(2, 3), shingle_unigrams=False)
    terms, positions = an("the servers failing")
    # raw: the(0)* servers(1) failing(2); stems: server, fail
    assert list(zip(terms, positions)) == [
        ("_ server", 0),
        ("_ server fail", 0),
        ("server fail", 1),
    ]
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_analyzer(shingle=(1, 2))
    with _pytest.raises(ValueError):
        make_analyzer(shingle=(2, 2), ngram=(2, 3))


def test_cjk_bigram_chain():
    """CJKBigramFilter semantics: consecutive CJK chars -> sliding
    bigrams, lone char -> unigram, ASCII passthrough + stop gaps."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(cjk_bigram=True)
    terms, pos = an("the scan 一二三 merge 四 and ガガ")
    assert terms == ["scan", "一二", "二三", "merge", "四", "ガガ"]
    # 'the' leaves a gap at 0; 'and' leaves a gap between 四 and ガガ
    assert pos == [1, 2, 3, 4, 5, 7]
    assert an("一") == (["一"], [0])
    assert an("한국 어") == (["한국", "어"], [0, 1])
    # mixed scripts in one contiguous run still bigram across scripts
    assert an("一ガ")[0] == ["一ガ"]
    assert an("")[0] == []


def test_cjk_bigram_rejects_gram_combos():
    import pytest as _pytest

    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    with _pytest.raises(ValueError):
        make_analyzer(cjk_bigram=True, shingle=(2, 2))


def test_word_delimiter_javadoc_examples():
    """WordDelimiterFilter.java:38-53,77-131 pinned examples."""
    from lucene_solr_spark.analysis.tokenizer import tokenize_raw_wdf

    assert tokenize_raw_wdf("PowerShot") == ["power", "shot"]
    assert tokenize_raw_wdf("SD500") == ["sd", "500"]
    assert tokenize_raw_wdf("500-42") == ["500", "42"]
    assert tokenize_raw_wdf("wi-fi") == ["wi", "fi"]
    assert tokenize_raw_wdf("O'Neil's") == ["o", "neil"]
    assert tokenize_raw_wdf("j2se") == ["j", "2", "se"]
    assert tokenize_raw_wdf("Super-Duper-XL500-42-AutoCoder!") == [
        "super", "duper", "xl", "500", "42", "auto", "coder",
    ]
    assert tokenize_raw_wdf("NFCCards") == ["nfc", "cards"]


def test_word_delimiter_chain_positions():
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(word_delimiter=True)
    terms, pos = an("the PowerShot is NFCCards ready")
    assert terms == ["power", "shot", "nfc", "cards", "ready"]
    assert pos == [1, 2, 4, 5, 6]


def test_common_grams_javadoc_example():
    """CommonGramsFilter.java javadoc: 'the quick brown fox' ->
    the, the_quick (same position), quick, brown, fox."""
    from lucene_solr_spark.analysis.tokenizer import (
        common_grams_fold,
        make_analyzer,
    )

    terms, pos = common_grams_fold(["the", "quick", "brown", "fox"])
    assert terms == ["the", "the_quick", "quick", "brown", "fox"]
    assert pos == [0, 0, 1, 2, 3]
    # with the stop filter after: common unigrams drop, grams survive
    an = make_analyzer(common_grams=True, stop=True)
    t2, p2 = an("the quick brown fox")
    assert t2 == ["the_quick", "quick", "brown", "fox"]
    assert p2 == [0, 1, 2, 3]
    # gram on the right side too: 'of' common
    t3, _ = an("queen of hearts")
    assert "queen_of" in t3 and "of_hearts" in t3


def test_length_pattern_and_keyword_marker_slots():
    """LengthFilter (position-gap preserving), PatternReplaceFilter
    (arity preserving), SetKeywordMarkerFilter (stemmer bypass)."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(length=(4, 5))
    terms, positions = an("a scan of merges and keys")
    # 'a'/'of'/'and' are stopwords; 'keys' (4) and 'scan' (4) survive,
    # 'merges' (6) is dropped by length but its position gap remains
    assert terms == ["scan", "keys"]
    assert positions == [1, 5]

    an = make_analyzer(pattern_replace=(r"[0-9]+", "#"))
    terms, positions = an("scan42 x9 merge")
    assert terms == ["scan#", "x#", "merge"]
    assert positions == [0, 1, 2]

    an = make_analyzer(stem=True, stem_exclusions=frozenset({"merges"}))
    terms, _ = an("merges scanning")
    assert terms[0] == "merges"  # protected from Porter
    assert terms[1] != "scanning"  # stemmed


def test_html_strip_char_filter():
    """LegacyHTMLStripCharFilter analogue: comments, script/style with
    content, tags, named + numeric entities."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(html_strip=True)
    html = (
        '<div class="x"><!-- note --><p>scan &amp; merge</p>'
        "<script>var z=1;</script><style>.a{color:red}</style>"
        "key&#32;order&#x20;hash</div>"
    )
    terms, positions = an(html)
    assert terms == ["scan", "merge", "key", "order", "hash"]
    # composes with folding and stemming slots
    an2 = make_analyzer(html_strip=True, stem=True)
    terms2, _ = an2("<b>scanning</b>")
    assert terms2 == ["scan"]


def test_tokenizer_registry_slot():
    """Tokenizer slot alternatives (lucene/analysis/core +
    pattern/PatternTokenizer.java): whitespace / letter / keyword /
    pattern, with the reference analyzers' no-lowercase default."""
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    ws = make_analyzer(tokenizer="whitespace", stop=False)
    assert ws("Hello  World, 42!")[0] == ["Hello", "World,", "42!"]
    # explicit LowerCaseFilter
    wl = make_analyzer(tokenizer="whitespace", lowercase=True, stop=False)
    assert wl("Hello World")[0] == ["hello", "world"]
    # LetterTokenizer: digits/punct split letter runs
    lt = make_analyzer(tokenizer="letter", stop=False)
    assert lt("ab12cd ef-gh")[0] == ["ab", "cd", "ef", "gh"]
    # KeywordTokenizer: whole input, one token, one position
    kw = make_analyzer(tokenizer="keyword", stop=False)
    assert kw("one two three") == (["one two three"], [0])
    assert kw("") == ([], [])
    # PatternTokenizer, delimiter mode (group=-1)
    pt = make_analyzer(tokenizer=("pattern", r"[;,]\s*"), stop=False)
    assert pt("a; b,c")[0] == ["a", "b", "c"]
    # PatternTokenizer, capture-group mode
    pg = make_analyzer(tokenizer=("pattern", r"'([^']+)'", 1), stop=False)
    assert pg("say 'hi' and 'bye'")[0] == ["hi", "bye"]
    # downstream filters still compose (stop over lowercased stream)
    wstop = make_analyzer(tokenizer="whitespace", lowercase=True)
    terms, pos = wstop("the quick fox")
    assert terms == ["quick", "fox"] and pos == [1, 2]
    # guards
    import pytest

    with pytest.raises(ValueError):
        make_analyzer(tokenizer="nope")
    with pytest.raises(ValueError):
        make_analyzer(tokenizer="whitespace", cjk_bigram=True)


def test_path_hierarchy_tokenizer():
    """PathHierarchyTokenizer.java reference behavior incl. trailing
    delimiter, relative paths, replacement char and skip."""
    from lucene_solr_spark.analysis.tokenizer import make_path_tokenizer

    t = make_path_tokenizer()
    assert t("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert t("a/b/c") == ["a", "a/b", "a/b/c"]
    assert t("/a/b/c/") == ["/a", "/a/b", "/a/b/c", "/a/b/c/"]
    assert t("") == []
    # replacement char substitutes the delimiter in emitted tokens
    r = make_path_tokenizer("/", "\\")
    assert r("/a/b") == ["\\a", "\\a\\b"]
    # skip: first n segments dropped, tokens start at the delimiter
    s = make_path_tokenizer(skip=1)
    assert s("/a/b/c") == ["/b", "/b/c"]
    assert s("a/b/c") == ["/b", "/b/c"]
    # analyzer integration: all tokens share one position slot
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(tokenizer=("path",), stop=False)
    terms, pos = an("/x/y")
    assert terms == ["/x", "/x/y"] and pos == [0, 1]


def test_english_minimal_and_possessive():
    """EnglishMinimalStemmer.java (S-stemmer) + EnglishPossessiveFilter
    pins, incl. the keep rules for -us/-ss/-ies-after-vowel."""
    from lucene_solr_spark.analysis.tokenizer import (
        english_minimal_stem,
        english_possessive,
        make_analyzer,
    )

    pins = {
        "queries": "query", "berries": "berry", "bus": "bus",
        "class": "class", "days": "day", "goes": "goes",
        "tables": "table", "as": "as", "areas": "area",
        "sees": "sees", "species": "specy",
    }
    for w, want in pins.items():
        assert english_minimal_stem(w) == want, w
    assert english_possessive("john's") == "john"
    assert english_possessive("its") == "its"
    assert english_possessive("x’S") == "x"
    an = make_analyzer(minimal_stem=True, possessive=True)
    assert an("the customer's tables")[0] == ["customer", "table"]
    import pytest

    with pytest.raises(ValueError):
        make_analyzer(stem=True, minimal_stem=True)


def test_auto_stopword_analyzer(spark):
    """QueryAutoStopWordAnalyzer: df-derived stopwords ADD to the
    delegate's stop set (maxDocFreq absolute + maxPercentDocs)."""
    from lucene_solr_spark.analysis.autostop import (
        auto_stopword_analyzer,
        auto_stopwords,
    )

    df = spark.createDataFrame(
        [(i, "common word" + (" rare" if i == 0 else "")) for i in range(10)],
        "doc_id int, text string",
    )
    assert auto_stopwords(df, max_doc_freq=5) == {"common", "word"}
    assert auto_stopwords(df, max_percent_docs=0.5) == {"common", "word"}
    an = auto_stopword_analyzer(df, max_doc_freq=5)
    # auto words AND english stopwords both drop; rare survives
    assert an("the common rare word")[0] == ["rare"]
    import pytest

    with pytest.raises(ValueError):
        auto_stopwords(df)


def test_phonetic_encoders_and_filter():
    """Soundex pins (American archival variant: H/W transparency,
    vowel separation, first-letter collapse), RefinedSoundex
    commons-codec pin, and PhoneticFilter inject semantics."""
    from lucene_solr_spark.analysis.phonetic import (
        refined_soundex,
        soundex,
    )
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    pins = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "": "",
    }
    for w, want in pins.items():
        assert soundex(w) == want, w
    assert refined_soundex("testing") == "T6036084"
    # inject=true: original + code share the position
    inj = make_analyzer(phonetic="soundex")
    terms, pos = inj("the robert merge")
    assert terms == ["robert", "R163", "merge", "M620"]
    assert pos == [1, 1, 2, 2]
    # inject=false: code replaces the token; letterless tokens survive
    rep = make_analyzer(phonetic="soundex", phonetic_inject=False)
    assert rep("robert 42")[0] == ["R163", "42"]
    import pytest

    with pytest.raises(ValueError):
        make_analyzer(phonetic="nope")
    with pytest.raises(ValueError):
        make_analyzer(phonetic="soundex", shingle=(2, 2))


def test_compound_word_filter():
    """DictionaryCompoundWordTokenFilter: original passes through,
    dictionary subwords at every (overlapping) offset share its
    position; minWordSize gates decomposition; onlyLongestMatch keeps
    one per start offset."""
    from lucene_solr_spark.analysis.tokenizer import (
        make_analyzer,
        make_compound_filter,
    )

    d = frozenset({"scan", "merge", "en", "es", "de"})
    an = make_analyzer(compound=d, stop=False)
    terms, pos = an("descan tiny")
    # 'descan': de@0, es@1 (overlap), scan@2 — all found
    assert terms == ["descan", "de", "es", "scan", "tiny"]
    assert pos == [0, 0, 0, 0, 1]  # subwords share the original slot
    # tokens under minWordSize (5) never decompose
    assert an("des")[0] == ["des"]
    # onlyLongestMatch: one longest subword per start
    f = make_compound_filter(
        frozenset({"s", "sc", "scan"}), only_longest_match=True,
        min_subword_size=1,
    )
    assert f(["descanx"], [0])[0] == ["descanx", "scan"]
    import pytest

    with pytest.raises(ValueError):
        make_analyzer(compound=d, phonetic="soundex")


def test_caverphone2_spec_pins():
    """Caverphone 2.0 (Hood 2004): the spec's own examples plus
    padding/empty behavior; available in the phonetic filter slot."""
    from lucene_solr_spark.analysis.phonetic import caverphone2
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert caverphone2("Thompson") == "TMPSN11111"
    assert caverphone2("") == ""
    assert len(caverphone2("x")) == 10
    an = make_analyzer(phonetic="caverphone", phonetic_inject=False)
    assert an("peter stevenson")[0] == ["PTA1111111", "STFNSN1111"]


def test_mapping_char_filter_longest_match():
    from lucene_solr_spark.analysis.tokenizer import make_mapping_char_filter

    # NormalizeCharMap greedy longest-match: "aa"->"x" wins over "a"->"y"
    cf = make_mapping_char_filter({"a": "y", "aa": "x"})
    assert cf("aaa b a") == "xy b y"
    # replacement text is not rescanned
    cf2 = make_mapping_char_filter({"a": "aa"})
    assert cf2("aba") == "aabaa"
    an = make_analyzer(char_filters=[("mapping", {"ph": "f"})], stop=False)
    assert an("phone graphs")[0] == ["fone", "grafs"]


def test_pattern_replace_char_filter():
    an = make_analyzer(
        char_filters=[("pattern", r"[0-9]+", " ")], stop=False
    )
    # digits become separators BEFORE tokenization -> two tokens
    assert an("ab12cd")[0] == ["ab", "cd"]
    # vs PatternReplaceFilter (token rewrite) which keeps one token
    an2 = make_analyzer(pattern_replace=(r"[0-9]+", ""), stop=False)
    assert an2("ab12cd")[0] == ["ab12cd".replace("12", "")]


def test_char_filter_order_strip_then_map_then_fold():
    an = make_analyzer(
        html_strip=True,
        char_filters=[("mapping", {"&": " and "})],
        fold=True,
        stop=False,
    )
    terms, _ = an("<b>café &amp; bar</b>")
    # strip decodes &amp; to &, mapping turns & into ' and ', fold
    # ascii-folds the e-acute
    assert terms == ["cafe", "and", "bar"]


def test_trim_and_keep_word_filters():
    # trim matters with non-splitting tokenizers
    an = make_analyzer(tokenizer="keyword", trim=True, stop=False)
    assert an("  hello world  ")[0] == ["hello world"]
    an2 = make_analyzer(keep_words=frozenset({"scan", "merge"}), stop=False)
    terms, positions = an2("scan the merge key scan")
    assert terms == ["scan", "merge", "scan"]
    assert positions == [0, 2, 4]  # position gaps preserved


def test_capitalization_filter():
    from lucene_solr_spark.analysis.tokenizer import capitalize_token

    assert capitalize_token("hello") == "Hello"
    assert capitalize_token("HELLO") == "Hello"
    # onlyFirstWord default: later words lowercased
    assert capitalize_token("big CITY lights") == "Big city lights"
    assert capitalize_token("") == ""
    an = make_analyzer(tokenizer="keyword", capitalization=True, stop=False)
    assert an("john SMITH")[0] == ["John smith"]


def test_remove_duplicates_and_limit_tokens():
    an = make_analyzer(
        compound=frozenset({"soft", "ball"}),
        remove_duplicates=True,
        stop=False,
    )
    # compound injects subwords at the same position; a repeated
    # injection at the same slot would be dropped (none here), while
    # the same term at DIFFERENT positions survives
    terms, positions = an("softball softball")
    assert terms == ["softball", "soft", "ball", "softball", "soft", "ball"]
    assert positions == [0, 0, 0, 1, 1, 1]
    an2 = make_analyzer(limit_tokens=3, stop=False)
    assert an2("one two three four five")[0] == ["one", "two", "three"]
    # dedup at same position: double-metaphone inject where primary ==
    # token encoding collapses
    an3 = make_analyzer(
        phonetic="soundex", phonetic_inject=True, remove_duplicates=True,
        stop=False,
    )
    t3, p3 = an3("r150")  # a token already equal to its soundex code?
    assert len(t3) == len(set(zip(t3, p3)))


def test_hyphenated_words_filter():
    from lucene_solr_spark.analysis.tokenizer import merge_hyphenated

    assert merge_hyphenated(["ecologi-", "cal"]) == ["ecological"]
    assert merge_hyphenated(["a", "hy-", "phen-", "ated", "word"]) == [
        "a", "hyphenated", "word",
    ]
    # trailing unfinished fragment gets the hyphen back
    assert merge_hyphenated(["broken-"]) == ["broken-"]
    assert merge_hyphenated([]) == []
    an = make_analyzer(
        tokenizer="whitespace", lowercase=True,
        hyphenated_words=True, stop=False,
    )
    terms, positions = an("eco- logical scan")
    assert terms == ["ecological", "scan"]
    assert positions == [0, 1]


def test_common_grams_query_filter_reference_vectors():
    """CommonGramsFilterTest.java:100-148 pinned vectors (s = common,
    n = normal) — the class javadoc's example disagrees with these and
    the tests win."""
    from lucene_solr_spark.analysis.tokenizer import common_grams_query_fold

    common = frozenset({"s", "the", "of"})

    def q(text):
        return common_grams_query_fold(text.split(), common)[0]

    assert q("brown fox") == ["brown", "fox"]
    assert q("the fox") == ["the_fox"]
    assert q("fox of") == ["fox_of"]
    assert q("of the") == ["of_the"]
    assert q("the") == ["the"]
    assert q("foo") == ["foo"]
    assert q("n n n") == ["n", "n", "n"]
    assert q("n n s") == ["n", "n_s"]
    assert q("n s n") == ["n_s", "s_n"]
    assert q("n s s") == ["n_s", "s_s"]
    assert q("s n n") == ["s_n", "n", "n"]
    assert q("s n s") == ["s_n", "n_s"]
    assert q("s s n") == ["s_s", "s_n"]
    assert q("quick brown fox") == ["quick", "brown", "fox"]
    assert q("quick brown the") == ["quick", "brown_the"]
    assert q("quick the brown") == ["quick_the", "the_brown"]
    assert q("fox of the") == ["fox_of", "of_the"]
    assert q("the quick brown") == ["the_quick", "quick", "brown"]
    assert q("of the fox") == ["of_the", "the_fox"]
    # analyzer slot: query mode pairs with the index-side grams
    an_q = make_analyzer(common_grams="query")
    an_i = make_analyzer(common_grams=True)
    q_terms, _ = an_q("merge the scan")
    i_terms, _ = an_i("merge the scan")
    assert q_terms == ["merge_the", "the_scan"]
    assert set(q_terms) <= set(i_terms)  # every query token is indexed


def test_common_grams_query_stems_like_index_side():
    an_i = make_analyzer(common_grams=True, stem=True)
    an_q = make_analyzer(common_grams="query", stem=True)
    i_terms, _ = an_i("merging the scan")
    q_terms, _ = an_q("merging the scan")
    # unigrams stem on both sides; grams stay raw on both sides
    assert set(q_terms) <= set(i_terms)
    assert "merging_the" in q_terms and "the_scan" in q_terms
    # guard: limit_tokens=0 is rejected with common_grams like any
    # other incompatible option
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_analyzer(common_grams=True, limit_tokens=0)


def test_stemmer_override_filter():
    # StemmerOverrideFilter.java:54-65 — dictionary hits replace the
    # term and keyword-mark it so the stemmer is bypassed; misses stem
    # normally.
    an = make_analyzer(
        stem=True,
        stemmer_overrides={"running": "sprint", "queries": "queries"},
    )
    terms, _ = an("running queries tables")
    assert terms == ["sprint", "queries", "tabl"]
    # overrides compose with snowball too, and exclusions still apply
    an2 = make_analyzer(
        stem="snowball", stemmer_overrides={"merge": "combine"}
    )
    t2, _ = an2("merge merging value")
    assert t2 == ["combine", "merg", "valu"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_analyzer(common_grams=True, stemmer_overrides={"a": "b"})
