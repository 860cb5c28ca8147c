"""Porter2 (Snowball English) stemmer — spec-traced goldens.

Every expected value below was derived BY HAND from the published
Porter2 specification (regions R1/R2, steps 0-5, exceptional forms),
tracing region offsets and suffix conditions — not from running any
stemmer. They double as the justification for the CASE-mapping oracle
in lucene_solr_spark/oracles.py::snowball_freq.
"""

from lucene_solr_spark.analysis.snowball import porter2_stem as st


def test_exceptional_forms():
    assert st("skis") == "ski"
    assert st("skies") == "sky"
    assert st("dying") == "die"
    assert st("lying") == "lie"
    assert st("tying") == "tie"
    assert st("idly") == "idl"
    assert st("gently") == "gentl"
    assert st("ugly") == "ugli"
    assert st("early") == "earli"
    assert st("only") == "onli"
    assert st("singly") == "singl"
    for w in ("sky", "news", "howe", "atlas", "cosmos", "bias", "andes"):
        assert st(w) == w
    # invariant after step 1a
    for w in ("inning", "outing", "canning", "herring", "earring",
              "proceed", "exceed", "succeed"):
        assert st(w) == w


def test_short_words_untouched():
    assert st("by") == "by"
    assert st("a") == "a"
    assert st("as") == "as"


def test_step0_apostrophes():
    assert st("dog's") == "dog"
    assert st("dogs'") == "dog"
    # dogs's -> step0 's' (longest "'s'"? no: ends 's, strip) -> dogs -> dog
    assert st("kings's") == "king"


def test_step1a():
    assert st("caresses") == "caress"  # sses -> ss
    assert st("ponies") == "poni"      # ies, stem > 1 letter -> i
    assert st("ties") == "tie"         # ies, one-letter stem -> ie
    assert st("cries") == "cri"
    assert st("caress") == "caress"    # ss untouched
    assert st("cats") == "cat"         # s with earlier vowel
    assert st("gas") == "gas"          # only vowel immediately before s
    assert st("kiwis") == "kiwi"
    assert st("consensus") == "consensus"  # us untouched


def test_step1b():
    # eed in R1 -> ee; feed's eed is outside R1
    assert st("agreed") == "agre"      # eed->ee, then step-5 e removal
    assert st("feed") == "feed"
    assert st("plastered") == "plaster"
    assert st("motoring") == "motor"
    assert st("sing") == "sing"        # no vowel before ing
    assert st("conflated") == "conflat"  # at+e restore, step5 drops it
    assert st("hopping") == "hop"      # double undoubled
    assert st("hoping") == "hope"      # short word -> +e
    assert st("falling") == "fall"
    assert st("filing") == "file"


def test_step1c_y_to_i():
    assert st("happy") == "happi"
    assert st("cry") == "cri"
    assert st("say") == "say"          # preceded by vowel
    assert st("enjoy") == "enjoy"


def test_steps_2_to_4_chains():
    # traces in the module docstring style: region offsets by hand
    assert st("relational") == "relat"      # ational->ate, step5 e
    assert st("conditional") == "condit"    # tional->tion, step4 ion
    assert st("valenci") == "valenc"        # enci->ence, step5 e
    assert st("hesitanci") == "hesit"       # anci->ance, step4 ance
    assert st("digitizer") == "digit"       # izer->ize, step4 ize
    assert st("operational") == "oper"      # ational->ate, step4 ate
    assert st("feudalism") == "feudal"      # alism->al
    assert st("decisiveness") == "decis"    # iveness->ive, step4 ive
    assert st("hopefulness") == "hope"      # fulness->ful, step3 ful
    assert st("callousness") == "callous"   # ousness->ous
    assert st("formaliti") == "formal"      # aliti->al
    assert st("sensitiviti") == "sensit"    # iviti->ive, step4 ive
    assert st("triplicate") == "triplic"    # icate->ic
    assert st("formative") == "format"      # ative not in R2; step4 ive
    assert st("formalize") == "formal"      # alize->al
    assert st("electriciti") == "electr"    # iciti->ic, step4 ic
    assert st("electrical") == "electr"     # ical->ic, step4 ic
    assert st("hopeful") == "hope"          # step3 ful
    assert st("goodness") == "good"         # step3 ness
    assert st("generously") == "generous"   # gener R1 override; ousli->ous
    assert st("fluently") == "fluentli"     # entli outside R1 -> only 1c


def test_step4():
    assert st("revival") == "reviv"
    assert st("allowance") == "allow"
    assert st("inference") == "infer"
    assert st("airliner") == "airlin"
    assert st("gyroscopic") == "gyroscop"
    assert st("adjustable") == "adjust"
    assert st("defensible") == "defens"
    assert st("irritant") == "irrit"
    assert st("replacement") == "replac"
    assert st("adjustment") == "adjust"
    assert st("dependent") == "depend"
    assert st("adoption") == "adopt"        # ion preceded by t
    assert st("communism") == "communism"   # commun R1 override: ism at
    # pos 6 in R1(=6) but R2 starts 8 -> kept
    assert st("activate") == "activ"
    assert st("angulariti") == "angular"
    assert st("homologous") == "homolog"
    assert st("effective") == "effect"
    assert st("bowdlerize") == "bowdler"


def test_step5():
    assert st("probate") == "probat"
    assert st("rate") == "rate"        # e preceded by short syllable 'rat'
    assert st("cease") == "ceas"
    assert st("controll") == "control"  # ll with second l in R2
    assert st("roll") == "roll"


def test_y_consonant_marking():
    assert st("youth") == "youth"      # initial y is a consonant
    assert st("yellow") == "yellow"
    # y after vowel is a consonant marker: 'saying' -> say + ing
    assert st("saying") == "say"


def test_corpus_vocabulary_trace():
    """The 31-word documents vocabulary — the oracle's CASE mapping."""
    changed = {
        "customer": "custom",
        "merge": "merg",
        "query": "queri",
        "table": "tabl",
        "value": "valu",
    }
    fixed = [
        "agg", "batch", "big", "column", "data", "dup", "fast",
        "filter", "group", "hash", "join", "key", "line", "order",
        "part", "row", "scan", "slow", "small", "sort", "spark",
        "stream", "vector", "window",
    ]
    for w, e in changed.items():
        assert st(w) == e, (w, st(w))
    for w in fixed:
        assert st(w) == w, (w, st(w))


def test_analyzer_snowball_slot():
    from lucene_solr_spark.analysis.tokenizer import make_analyzer

    an = make_analyzer(stem="snowball")
    assert an("merging tables rapidly")[0] == ["merg", "tabl", "rapid"]
