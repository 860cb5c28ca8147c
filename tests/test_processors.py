"""UpdateRequestProcessor chain: field-mutating processors, URL
classification and the TextProfileSignature fuzzy dedup
(solr/core/src/java/org/apache/solr/update/processor/)."""

import hashlib

import pyspark.sql.functions as F

from lucene_solr_spark.io import processors as P


def _profile_signature_py(text, quant_rate=0.01, min_token_len=2):
    """Independent Python re-statement of TextProfileSignature.java:
    68-140 for golden comparison (deterministic cnt desc / tok asc
    tie-break, as the engine documents)."""
    import re

    toks = [
        t
        for t in re.findall(r"[a-z0-9]+", text.lower())
        if len(t) > min_token_len
    ]
    if not toks:
        return hashlib.md5(b"").hexdigest()
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    mf = max(counts.values())
    quant = int(mf * quant_rate + 0.5)
    if quant < 2:
        quant = 2 if mf > 1 else 1
    prof = []
    for tok, cnt in counts.items():
        q = (cnt // quant) * quant
        if q >= quant:
            prof.append((q, tok))
    prof.sort(key=lambda p: (-p[0], p[1]))
    s = "\n".join(f"{tok} {cnt}" for cnt, tok in prof)
    return hashlib.md5(s.encode()).hexdigest()


def test_text_profile_signature_matches_golden(spark):
    texts = [
        "Hello world hello WORLD the quick brown fox the the",
        "one two three four five six seven eight nine ten",
        "aaa aaa aaa bbb bbb ccc",
        "xy xy xy",  # every token <= minTokenLen -> empty profile
        "",
        "word " * 300 + "rare once",  # maxFreq 300 -> QUANT 3
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["signature"]
        for r in P.text_profile_signatures(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _profile_signature_py(t), f"doc {i}"


def test_text_profile_case_and_punct_invariance(spark):
    """The Nutch profile is a FUZZY signature: case, punctuation and
    token order do not change it; real content changes do."""
    df = spark.createDataFrame(
        [
            (1, "The Quick... BROWN fox; jumps!"),
            (2, "quick brown the fox jumps"),
            (3, "quick brown the fox sleeps"),
        ],
        "doc_id int, text string",
    )
    sigs = {
        r["doc_id"]: r["signature"]
        for r in P.text_profile_signatures(df).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_signature_dedup_textprofile_last_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (5, "ALPHA, beta. gamma delta!"),
            (3, "something else entirely here"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in P.signature_dedup_textprofile(df).collect()
    }
    assert set(rows) == {5, 3}  # max doc_id survives per signature
    assert rows[5]["n_docs"] == 2


def test_url_classify_reference_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/"),
            (2, "https://example.com/a/b/index.html"),
            (3, "https://example.com/a/b/page.html?q=1"),
            (4, "https://example.com/a/b/welcome.php/"),
            (5, "https://example.com/one/two/three"),
            (6, "no scheme here"),
        ],
        "doc_id int, url string",
    )
    out = {
        r["doc_id"]: r
        for r in P.url_classify(
            df, "url", domain=True, canonical=True
        ).collect()
    }
    # URLClassifyProcessor.java: toplevel = stripped path empty + no
    # query; landing = no query + suffix match ("/" included)
    assert (out[1]["url_levels"], out[1]["url_toplevel"]) == (0, 1)
    assert out[1]["url_landingpage"] == 1
    assert (out[2]["url_levels"], out[2]["url_landingpage"]) == (2, 1)
    assert out[2]["url_canonical"] == "https://example.com/a/b/"
    # a query string blocks the landing flag and the canonical strip
    assert out[3]["url_landingpage"] == 0
    assert out[3]["url_canonical"] == out[3]["url"]
    # trailing "/" outranks welcome.php in landingPageSuffixes order
    assert out[4]["url_landingpage"] == 1
    assert out[4]["url_canonical"] == out[4]["url"]
    # levels() counts every '/' of the stripped path ("a top-level URL
    # is 0"): /one/two/three -> 3
    assert out[5]["url_levels"] == 3
    assert out[5]["url_landingpage"] == 0
    assert out[5]["url_domain"] == "example.com"
    # malformed rows pass through with null metadata
    assert out[6]["url_length"] is None


def test_normalize_urls_dot_segments(spark):
    df = spark.createDataFrame(
        [
            (1, "https://h.io/a/./b/../c/page.html"),
            (2, "https://h.io/a/b/../../x/"),
            (3, "https://h.io/plain/path"),
            (4, "https://h.io/a/./b/?q=./z"),
        ],
        "doc_id int, url string",
    )
    got = {
        r["doc_id"]: r["norm"]
        for r in P.normalize_urls(df, "url", out="norm").collect()
    }
    assert got[1] == "https://h.io/a/c/page.html"
    assert got[2] == "https://h.io/x/"
    assert got[3] == "https://h.io/plain/path"  # untouched fast path
    assert got[4] == "https://h.io/a/b/?q=./z"  # query preserved


def test_field_mutating_chain(spark):
    df = spark.createDataFrame(
        [(1, "  padded  ", ["b", "a", "b"], None, "")],
        "id int, s string, vals array<string>, miss string, blank string",
    )
    chain = P.ProcessorChain(
        lambda d: P.trim_fields(d, "s"),
        lambda d: P.truncate_fields(d, 3, "s"),
        lambda d: P.uniq_values(d, "vals"),
        lambda d: P.count_field_values(d, "vals", "n_vals"),
        lambda d: P.concat_values(d, "vals", "|"),
        lambda d: P.remove_blank(d, "blank"),
        lambda d: P.default_value(d, "miss", "dflt"),
        lambda d: P.uuid_field(d, "uuid", "id", "s"),
        lambda d: P.add_timestamp(d, "ts", "2026-08-18T00:00:00Z"),
    )
    r = chain(df).collect()[0]
    assert r["s"] == "pad"
    assert r["vals"] == "b|a"
    assert r["n_vals"] == 2
    assert r["blank"] is None
    assert r["miss"] == "dflt"
    # name-based UUID: md5("1 pad") in RFC-4122 v3 layout, variant
    # nibble forced to 8/9/a/b like UUID.nameUUIDFromBytes
    h = hashlib.md5(b"1 pad").hexdigest()
    var = "89ab89ab89ab89ab"[int(h[16], 16)]
    expect = f"{h[:8]}-{h[8:12]}-3{h[13:16]}-{var}{h[17:20]}-{h[20:32]}"
    assert r["uuid"] == expect
    assert expect[19] in "89ab"
    assert r["ts"] is not None


def test_multivalue_first_last_min_max(spark):
    df = spark.createDataFrame(
        [(1, ["m", "a", "z"]), (2, [])],
        "id int, vals array<string>",
    )
    first = {
        r["id"]: r["vals"] for r in P.first_value(df, "vals").collect()
    }
    last = {
        r["id"]: r["vals"] for r in P.last_value(df, "vals").collect()
    }
    mn = {r["id"]: r["vals"] for r in P.min_value(df, "vals").collect()}
    mx = {r["id"]: r["vals"] for r in P.max_value(df, "vals").collect()}
    assert (first[1], last[1], mn[1], mx[1]) == ("m", "z", "a", "z")
    # empty multi-value -> missing, never an error (ANSI-safe)
    assert first[2] is None and last[2] is None


def test_field_length_and_regex_replace(spark):
    df = spark.createDataFrame(
        [(1, "abcdef", "a-b-c")], "id int, s string, t string"
    )
    r = P.field_length(df, "s", "s_len").collect()[0]
    assert r["s_len"] == 6
    r = P.regex_replace(df, "t", "-", "_").collect()[0]
    assert r["t"] == "a_b_c"
