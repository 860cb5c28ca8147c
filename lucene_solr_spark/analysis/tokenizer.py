"""StandardAnalyzer-equivalent analysis chain, vectorized for Arrow UDFs.

Pipeline (reference: lucene/analysis/common/src/java/org/apache/lucene/
analysis/standard/StandardAnalyzer.java:110-116):

    StandardTokenizer -> StandardFilter -> LowerCaseFilter -> StopFilter

Pinned tokenizer grammar (an ASCII-safe UAX#29 word-break approximation of
StandardTokenizer 4.0, lucene/analysis/common/.../standard/
StandardTokenizer.java:90-115; behavior pinned by golden fixtures, NOT by
porting the JFlex DFA):

    token := [a-z0-9_]+ ( [.'] [a-z0-9_]+ )*        (on lowercased text)

i.e. alphanumeric/underscore runs, with single internal ``.`` or ``'``
joining two runs (UAX#29 MidNumLet / MidLetter / ExtendNumLet behavior for
"3.14", "don't", "foo_bar"). Lowercasing before tokenization commutes with
LowerCaseFilter for ASCII. Tokens longer than ``MAX_TOKEN_LENGTH`` (255,
StandardTokenizer.java:36 DEFAULT_MAX_TOKEN_LENGTH) are dropped without a
position increment.

StopFilter drops the 33-word English stop set
(lucene/analysis/common/.../core/StopAnalyzer.java:52-57) while preserving
position increments (gaps), per
lucene/analysis/common/.../util/FilteringTokenFilter.java:49-57.

``dl`` (the BM25 document length) is the count of tokens *surviving* the
stop filter — FieldInvertState.length semantics
(lucene/core/.../index/DocInverterPerField.java:102-177 counts only emitted
tokens; FieldInvertState.java:29-36).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

# lucene/analysis/common/.../core/StopAnalyzer.java:52-57 (33 words)
ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)

MAX_TOKEN_LENGTH = 255  # StandardTokenizer DEFAULT_MAX_TOKEN_LENGTH

TOKEN_PATTERN = r"[a-z0-9_]+(?:[.'][a-z0-9_]+)*"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# The same grammar as an ANSI-SQL/DuckDB regex (used by oracle_sql) — RE2
# and Python `re` agree on this pattern for ASCII input.
TOKEN_PATTERN_SQL = "[a-z0-9_]+(?:[.'][a-z0-9_]+)*"


def tokenize_raw(text: str) -> list[str]:
    """Tokenize + lowercase, before stop filtering. Position of raw[i] is i."""
    if not text:
        return []
    toks = _TOKEN_RE.findall(text.lower())
    if any(len(t) > MAX_TOKEN_LENGTH for t in toks):
        toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
    return toks


def analyze(text: str) -> tuple[list[str], list[int]]:
    """Full chain: returns (terms, positions) after stop removal.

    positions are indices into the raw (pre-stop) token stream, i.e. stop
    removal leaves gaps (FilteringTokenFilter.java:49-57). ``dl`` is
    ``len(terms)``.
    """
    raw = tokenize_raw(text)
    terms: list[str] = []
    positions: list[int] = []
    for pos, tok in enumerate(raw):
        if tok not in ENGLISH_STOP_WORDS:
            terms.append(tok)
            positions.append(pos)
    return terms, positions


def tokenize_flat(texts: pd.Series) -> dict:
    """COLUMN-vectorized analysis of a batch: one C-level regex findall,
    one vectorized stopword isin — no per-document Python. This is the
    DWPT hot kernel; per-doc analyze() loops halved parallel efficiency
    at 8+ workers (allocation/bandwidth bound), so the flat form is the
    build path's required shape.

    Returns flat post-stop token arrays:
      row   int64[n_tokens]  index into the batch (NOT doc_id)
      term  object[n_tokens]
      pos   int64[n_tokens]  pre-stop position (maxlen-filtered stream,
                             stop removal leaves gaps — FilteringTokenFilter)
      dl    int64[n_rows]    post-stop token count per batch row
    """
    import numpy as np

    n_rows = len(texts)
    toklists = texts.fillna("").astype(str).str.lower().str.findall(
        TOKEN_PATTERN
    )
    tl_arr = toklists.to_numpy()
    lens = np.fromiter(map(len, tl_arr), dtype=np.int64, count=n_rows)
    if int(lens.sum()) == 0:
        return {
            "row": np.zeros(0, dtype=np.int64),
            "term": np.zeros(0, dtype=object),
            "pos": np.zeros(0, dtype=np.int64),
            "dl": np.zeros(n_rows, dtype=np.int64),
        }
    flat_np = np.concatenate(
        [np.asarray(t, dtype=object) for t in tl_arr if t]
    )
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    # maxlen filter BEFORE position numbering (tokenize_raw drops long
    # tokens without a position increment)
    m = len(flat_np)
    tok_lens = np.fromiter(map(len, flat_np), dtype=np.int64, count=m)
    keep1 = tok_lens <= MAX_TOKEN_LENGTH
    if not keep1.all():
        flat_np = flat_np[keep1]
        rows = rows[keep1]
        m = len(rows)
    # pre-stop positions: cumcount within row
    is_new = np.empty(m, dtype=bool)
    is_new[0] = True
    is_new[1:] = rows[1:] != rows[:-1]
    starts = np.flatnonzero(is_new)
    grp = np.cumsum(is_new) - 1
    pos = np.arange(m, dtype=np.int64) - starts[grp]
    # stop filter (position gaps preserved: pos computed pre-filter)
    keep2 = ~pd.Series(flat_np, dtype="object").isin(
        _STOP_LIST_SORTED
    ).to_numpy()
    term = flat_np[keep2]
    rows2 = rows[keep2]
    pos2 = pos[keep2]
    dl = np.bincount(rows2, minlength=n_rows).astype(np.int64)
    return {"row": rows2, "term": term, "pos": pos2, "dl": dl}


_STOP_LIST_SORTED = sorted(ENGLISH_STOP_WORDS)


def invert_batch(
    doc_ids: pd.Series,
    texts: pd.Series,
    with_positions: bool = True,
    analyzer=None,
) -> pd.DataFrame:
    """Per-partition in-memory inversion — the DocumentsWriterPerThread
    analogue (lucene/core/.../index/DocumentsWriterPerThread.java:44,229):
    each Spark partition builds local (term -> (doc, tf, positions)) rows
    with no coordination; the term-hash shuffle afterwards plays the role
    of Lucene's sorted-term flush + merge.

    Returns a pandas frame (doc_id, term, tf, positions, dl); one row per
    (doc, distinct term); docs whose tokens are all stopwords emit nothing
    (their dl=0 norm is recovered by the builder via an anti-join).

    Default analyzer: fully vectorized via :func:`tokenize_flat` +
    factorize/lexsort grouping. A custom analyzer falls back to the
    per-doc loop (the Analyzer extension slot trades the fast path for
    arbitrary Python chains).
    """
    if analyzer is not None and analyzer is not analyze:
        return _invert_batch_loop(doc_ids, texts, with_positions, analyzer)
    import numpy as np

    fl = tokenize_flat(texts)
    rows2, term, pos2, dl = fl["row"], fl["term"], fl["pos"], fl["dl"]
    if len(rows2) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int32"),
                "positions": pd.Series([], dtype="object"),
                "dl": pd.Series([], dtype="int32"),
            }
        )
    codes, uniques = pd.factorize(term, sort=False)
    order = np.lexsort((pos2, codes, rows2))
    sd, sc, sp = rows2[order], codes[order], pos2[order]
    change = (
        np.flatnonzero((sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])) + 1
    )
    bounds = np.concatenate(([0], change, [len(sd)]))
    g_start, g_end = bounds[:-1], bounds[1:]
    g_doc = sd[g_start]
    docid_arr = doc_ids.to_numpy(dtype=np.int64)
    uniq_arr = np.asarray(uniques, dtype=object)
    if with_positions:
        plists = np.split(sp, bounds[1:-1])
    else:
        plists = [[]] * len(g_start)
    return pd.DataFrame(
        {
            "doc_id": docid_arr[g_doc],
            "term": uniq_arr[sc[g_start]],
            "tf": (g_end - g_start).astype("int32"),
            "positions": pd.Series(plists, dtype="object"),
            "dl": dl[g_doc].astype("int32"),
        }
    )


def _invert_batch_loop(
    doc_ids: pd.Series,
    texts: pd.Series,
    with_positions: bool,
    analyzer,
) -> pd.DataFrame:
    out_doc: list = []
    out_term: list[str] = []
    out_tf: list[int] = []
    out_pos: list[list[int]] = []
    out_dl: list[int] = []
    for doc_id, text in zip(doc_ids, texts):
        terms, positions = analyzer(text if isinstance(text, str) else "")
        if not terms:
            continue
        dl = len(terms)
        if with_positions:
            by_term: dict[str, list[int]] = {}
            for t, p in zip(terms, positions):
                by_term.setdefault(t, []).append(p)
            for t, plist in by_term.items():
                out_doc.append(doc_id)
                out_term.append(t)
                out_tf.append(len(plist))
                out_pos.append(plist)
                out_dl.append(dl)
        else:
            counts = Counter(terms)
            for t, tf in counts.items():
                out_doc.append(doc_id)
                out_term.append(t)
                out_tf.append(tf)
                out_pos.append([])
                out_dl.append(dl)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "term": pd.Series(out_term, dtype="object"),
            "tf": pd.Series(out_tf, dtype="int32"),
            "positions": pd.Series(out_pos, dtype="object"),
            "dl": pd.Series(out_dl, dtype="int32"),
        }
    )


# CJK codepoint ranges recognized by the bigram chain (Han, Hiragana,
# Katakana, Hangul — CJKBigramFilter's four script flags, all enabled):
# lucene/analysis/common/.../cjk/CJKBigramFilter.java:50-58
CJK_RANGES = (
    "一-鿿"  # Han ideographs
    "぀-ゟ"  # Hiragana
    "゠-ヿ"  # Katakana
    "가-힯"  # Hangul syllables
)
_CJK_TOKEN_RE = re.compile(
    rf"{TOKEN_PATTERN}|[{CJK_RANGES}]+"
)
_CJK_RUN_RE = re.compile(rf"[{CJK_RANGES}]+")


def tokenize_raw_cjk(text: str) -> list[str]:
    """StandardTokenizer approximation extended with CJK: ASCII word
    runs as usual, plus each contiguous CJK codepoint run as ONE
    token. CJKBigramFilter buffers consecutive CJK tokens only while
    their offsets stay aligned (CJKBigramFilter.java:180 ``if
    (offsetAtt.startOffset() != lastEndOffset) // unaligned, clear
    queue``) — i.e. whitespace/punctuation breaks the bigram window —
    so a contiguous-run token IS the filter's buffer unit."""
    if not text:
        return []
    toks = _CJK_TOKEN_RE.findall(text.lower())
    if any(
        len(t) > MAX_TOKEN_LENGTH and not _CJK_RUN_RE.fullmatch(t)
        for t in toks
    ):
        toks = [
            t
            for t in toks
            if len(t) <= MAX_TOKEN_LENGTH or _CJK_RUN_RE.fullmatch(t)
        ]
    return toks


def cjk_bigram_fold(raw: list[str]) -> list[str]:
    """CJKBigramFilter (lucene/analysis/common/.../cjk/
    CJKBigramFilter.java, default flags = all four scripts,
    outputUnigrams=false): each contiguous CJK run folds to sliding
    character bigrams (DOUBLE type); a single-char run is emitted
    as-is (the lone-character SINGLE case); non-CJK tokens pass
    through unmodified. Each emitted token advances the position by 1
    (both DOUBLE and SINGLE carry posIncrement 1 by default)."""
    out: list[str] = []
    for tok in raw:
        if _CJK_RUN_RE.fullmatch(tok):
            if len(tok) == 1:
                out.append(tok)
            else:
                out.extend(
                    tok[i : i + 2] for i in range(len(tok) - 1)
                )
        else:
            out.append(tok)
    return out


# WordDelimiterFilter default-flags split, expressed as a boundary-
# marking replace chain so the DuckDB oracle can run the IDENTICAL
# rules (RE2 has no lookahead). Semantics pinned to the reference's
# javadoc examples (lucene/analysis/common/.../miscellaneous/
# WordDelimiterFilter.java:38-53,77-131): intra-word delimiters split,
# case transitions split (incl. the acronym boundary NFCCards ->
# NFC Cards), letter<->digit transitions split, trailing English
# possessive 's removed, each part advancing one position
# (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE
# | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE; catenate/preserve
# flags off — the Solr default factory config).
_WDF_RULES: list[tuple[str, str]] = [
    (r"'[sS]($|[^A-Za-z0-9])", r"\1"),  # O'Neil's -> O'Neil
    (r"([a-z])([A-Z])", r"\1 \2"),  # PowerShot -> Power Shot
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),  # NFCCards -> NFC Cards
    (r"([A-Za-z])([0-9])", r"\1 \2"),  # SD500 -> SD 500
    (r"([0-9])([A-Za-z])", r"\1 \2"),  # j2se -> j 2 se
]
_WDF_RULES_C = [(re.compile(p), r) for p, r in _WDF_RULES]
_WDF_PART_RE = re.compile(r"[A-Za-z]+|[0-9]+")


def tokenize_raw_wdf(text: str) -> list[str]:
    """WhitespaceTokenizer + WordDelimiterFilter(default flags) +
    LowerCaseFilter: mark every WDF split boundary on the ORIGINAL-case
    text (case information must precede lowercasing, which is why this
    is its own tokenizer path), then emit alpha/digit runs lowercased.
    Remaining delimiters (-, ., etc.) split by the run extraction —
    'Super-Duper-XL500-42-AutoCoder!' -> super duper xl 500 42 auto
    coder (WordDelimiterFilter.java:53)."""
    if not text:
        return []
    for rx, rep in _WDF_RULES_C:
        text = rx.sub(rep, text)
    toks = [t.lower() for t in _WDF_PART_RE.findall(text)]
    if any(len(t) > MAX_TOKEN_LENGTH for t in toks):
        toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
    return toks


def common_grams_fold(
    raw: list[str], common: frozenset[str] = ENGLISH_STOP_WORDS
) -> tuple[list[str], list[int]]:
    """CommonGramsFilter (lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java): every unigram is kept, and every adjacent
    pair where EITHER token is a common word additionally emits
    'first_second' (SEPARATOR '_') at the FIRST token's position
    (posIncrement 0 — the javadoc 'the quick' example). Returns
    (terms, positions)."""
    terms: list[str] = []
    positions: list[int] = []
    for i, tok in enumerate(raw):
        terms.append(tok)
        positions.append(i)
        if i + 1 < len(raw) and (
            tok in common or raw[i + 1] in common
        ):
            terms.append(f"{tok}_{raw[i + 1]}")
            positions.append(i)
    return terms, positions


def common_grams_query_fold(
    raw: list[str], common: frozenset[str] = ENGLISH_STOP_WORDS
) -> tuple[list[str], list[int]]:
    """CommonGramsQueryFilter (LA/commongrams/CommonGramsQueryFilter
    .java:79-110) over the CommonGramsFilter stream: a unigram is
    dropped when the NEXT stream token is a gram (its `previous` slot
    is overwritten), and the trailing held token is dropped iff the
    last emitted token was a gram. Pinned to the reference's OWN test
    vectors (CommonGramsFilterTest.java:100-148 — e.g. 's n n' ->
    [s_n, n, n], 'n s n' -> [n_s, s_n]); the class javadoc's
    'spain'-dropped example disagrees with those tests and the code,
    and the tests win."""
    # the CommonGramsFilter stream: unigram then (maybe) gram per slot
    stream: list[tuple[str, bool]] = []
    for i, tok in enumerate(raw):
        stream.append((tok, False))
        if i + 1 < len(raw) and (tok in common or raw[i + 1] in common):
            stream.append((f"{tok}_{raw[i + 1]}", True))
    out: list[str] = []
    prev: tuple[str, bool] | None = None
    last_emitted_gram = False
    for tok, is_gram in stream:
        if prev is not None and not is_gram:
            out.append(prev[0])
            last_emitted_gram = prev[1]
        prev = (tok, is_gram)
    if prev is not None and not (out and last_emitted_gram):
        # exhaustion branch: emit the held token unless the previous
        # emission was a gram (reference previousType check)
        out.append(prev[0])
    return out, list(range(len(out)))


# ---------------------------------------------------------------------------
# Tokenizer registry (lucene/analysis/core + pattern): alternatives to
# the StandardTokenizer grammar for the make_analyzer tokenizer slot.
# ---------------------------------------------------------------------------


def tokenize_whitespace(text: str) -> list[str]:
    """WhitespaceTokenizer (lucene/analysis/core/.../
    WhitespaceTokenizer.java): maximal runs of non-whitespace; no case
    change, no token surgery. (The reference's CharTokenizer chunks
    tokens longer than 255 chars; here they pass whole — a documented
    simplification, unreachable on sane corpora.)"""
    return text.split() if text else []


_LETTER_RE = re.compile(r"[^\W\d_]+")


def tokenize_letter(text: str) -> list[str]:
    """LetterTokenizer (LetterTokenizer.java): maximal runs of
    Character.isLetter codepoints — digits and punctuation split."""
    return _LETTER_RE.findall(text) if text else []


def tokenize_keyword(text: str) -> list[str]:
    """KeywordTokenizer (KeywordTokenizer.java): the entire input as a
    single token."""
    return [text] if text else []


def make_pattern_tokenizer(pattern: str, group: int = -1):
    """PatternTokenizer (lucene/analysis/common/.../pattern/
    PatternTokenizer.java): group == -1 splits on the pattern
    (delimiter mode); group >= 0 emits that capture group of every
    match. Empty tokens are dropped, as the reference does."""
    rx = re.compile(pattern)
    if group == -1:
        return lambda t: [s for s in rx.split(t) if s] if t else []
    return (
        lambda t: [m.group(group) for m in rx.finditer(t) if m.group(group)]
        if t
        else []
    )


def make_path_tokenizer(
    delimiter: str = "/", replacement: str | None = None, skip: int = 0
):
    """PathHierarchyTokenizer (lucene/analysis/common/.../path/
    PathHierarchyTokenizer.java): cumulative path prefixes — "/a/b/c"
    -> "/a", "/a/b", "/a/b/c"; a trailing delimiter emits the closed
    prefix too; ``skip`` drops the first n segments and the remaining
    tokens start with the (replacement) delimiter, matching the
    reference's skip tests. All tokens share one position (posIncrement
    1 then 0s)."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement

    def tok(text: str) -> list[str]:
        if not text:
            return []
        segs = text.split(delimiter)
        if skip:
            body = segs[1:] if segs and segs[0] == "" else segs
            out = []
            for i in range(skip, len(body)):
                out.append(repl + repl.join(body[skip : i + 1]))
            return out
        out = []
        for i in range(len(segs)):
            prefix = repl.join(segs[: i + 1])
            if prefix:
                out.append(prefix)
        return out

    return tok


def english_minimal_stem(s: str) -> str:
    """EnglishMinimalStemmer.java:25-46 (S-stemmer, Harman 1991):
    plural-only stripping — 'ies' -> 'y' unless preceded by a/e;
    keep -us/-ss and -is/-as/-os/-es endings; else drop the final s."""
    if len(s) < 3 or s[-1] != "s":
        return s
    p = s[-2]
    if p in ("u", "s"):
        return s
    if p == "e":
        if len(s) > 3 and s[-3] == "i" and s[-4] not in ("a", "e"):
            return s[:-3] + "y"
        if s[-3] in ("i", "a", "o", "e"):
            return s
        return s[:-1]
    return s[:-1]


# FrenchAnalyzer.DEFAULT_ARTICLES (lucene/analysis/common/.../fr/
# FrenchAnalyzer.java:102-104) — the elidable articles, matched
# case-insensitively (CharArraySet ignoreCase=true).
FRENCH_ARTICLES: frozenset[str] = frozenset(
    {"l", "m", "t", "qu", "n", "s", "j"}
)


def elide_token(s: str, articles: frozenset[str]) -> str:
    """ElisionFilter (lucene/analysis/common/.../util/ElisionFilter.java:
    52-74): find the FIRST apostrophe (ASCII ``'`` or U+2019); if the
    prefix before it is in the article set (case-insensitive), strip
    prefix + apostrophe.  Tokens without an apostrophe, or with a
    non-article prefix, pass through unchanged.  Arity/position
    preserving (not a FilteringTokenFilter)."""
    idx = -1
    for i, ch in enumerate(s):
        if ch == "'" or ch == "’":
            idx = i
            break
    if idx >= 0 and s[:idx].lower() in articles:
        return s[idx + 1:]
    return s


_NUM_TOKEN_RE = re.compile(r"[0-9]+(?:[.'][0-9]+)*\Z")


def token_type(s: str) -> str:
    """StandardTokenizer type attribute (lucene/analysis/common/.../
    standard/StandardTokenizer.java:60-97): ``<NUM>`` for all-digit
    tokens (digits optionally joined by ``.``/``'`` per the grammar's
    numeric rule), ``<ALPHANUM>`` otherwise — the two types the ASCII
    grammar can produce (the CJK/Thai types need their scripts)."""
    return "<NUM>" if _NUM_TOKEN_RE.match(s) else "<ALPHANUM>"


def english_possessive(s: str) -> str:
    """EnglishPossessiveFilter.java:55-62: strip a trailing 's (also
    the Unicode apostrophes the 3.6+ path handles)."""
    if (
        len(s) >= 2
        and s[-2] in ("'", "\u2019", "\uff07")
        and s[-1] in ("s", "S")
    ):
        return s[:-2]
    return s


def make_compound_filter(
    dictionary,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
):
    """DictionaryCompoundWordTokenFilter (lucene/analysis/common/.../
    compound/DictionaryCompoundWordTokenFilter.java:66-88 +
    CompoundWordTokenFilterBase.java:104-130): the original token
    always passes through; every dictionary word found at any offset
    (sizes min..max, all starts incl. overlapping) follows at the SAME
    position (posIncrement 0). ``only_longest_match`` keeps one longest
    subword per start offset. Tokens shorter than ``min_word_size``
    are never decomposed."""
    dict_set = frozenset(dictionary)

    def run(
        terms: list[str], positions: list[int]
    ) -> tuple[list[str], list[int]]:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            for i in range(0, len(t) - min_subword_size + 1):
                longest = None
                for j in range(min_subword_size, max_subword_size + 1):
                    if i + j > len(t):
                        break
                    sub = t[i : i + j]
                    if sub in dict_set:
                        if only_longest_match:
                            longest = sub
                        else:
                            out_t.append(sub)
                            out_p.append(p)
                if only_longest_match and longest is not None:
                    out_t.append(longest)
                    out_p.append(p)
        return out_t, out_p

    return run


_TOKENIZERS = {
    "whitespace": tokenize_whitespace,
    "letter": tokenize_letter,
    "keyword": tokenize_keyword,
}


def make_mapping_char_filter(mappings: dict[str, str]):
    """MappingCharFilter over a NormalizeCharMap (LA/charfilter/
    MappingCharFilter.java:36-44 + NormalizeCharMap greedy matching):
    at each input position the LONGEST configured source string wins;
    replacement text is not re-scanned. Runs before the tokenizer.

    A regex alternation sorted longest-first reproduces the greedy
    longest-match walk (alternations try branches in order)."""
    import re as _re

    if not mappings:
        return lambda t: t
    keys = sorted(mappings, key=len, reverse=True)
    rx = _re.compile("|".join(_re.escape(k) for k in keys))
    return lambda t: rx.sub(lambda m: mappings[m.group(0)], t)


def make_pattern_replace_char_filter(pattern: str, replacement: str):
    """PatternReplaceCharFilter (LA/pattern/PatternReplaceCharFilter
    .java): regex replaceAll over the raw character stream before the
    tokenizer (vs PatternReplaceFilter which rewrites tokens)."""
    import re as _re

    rx = _re.compile(pattern)
    return lambda t: rx.sub(replacement, t)


def merge_hyphenated(tokens: list[str]) -> list[str]:
    """HyphenatedWordsFilter (LA/miscellaneous/HyphenatedWordsFilter
    .java:79-115): tokens ending in '-' (line-break hyphenation)
    accumulate — hyphens stripped — until a non-hyphen-ending token
    completes the word; the merged token takes the FIRST part's
    position slot. A trailing unfinished fragment gets its hyphen
    added back (reference back-compat branch). Meaningful after a
    whitespace tokenizer (the standard grammar never keeps '-')."""
    out: list[str] = []
    pending: list[str] = []
    for tok in tokens:
        if tok.endswith("-") and len(tok) > 0:
            pending.append(tok[:-1])
        elif pending:
            pending.append(tok)
            out.append("".join(pending))
            pending = []
        else:
            out.append(tok)
    if pending:
        out.append("".join(pending) + "-")
    return out


def capitalize_token(tok: str) -> str:
    """CapitalizationFilter with the reference defaults (LA/
    miscellaneous/CapitalizationFilter.java:79-122: onlyFirstWord=true,
    forceFirstLetter=true, minWordLength=0): the token splits into
    words on chars <= ' ' or '.', the first word gets Upper+lower, the
    rest are lowercased wholesale. The word-scan's separator double
    advance (i++ both in the branch and the loop) is preserved — a
    run of separators folds the skipped char into the next word."""
    buf = list(tok)
    n = len(buf)

    def process(off: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        if word_count > 0:  # onlyFirstWord: subsequent words lowercase
            for i in range(off, off + length):
                buf[i] = buf[i].lower()
            return
        buf[off] = buf[off].upper()
        for i in range(off + 1, off + length):
            buf[i] = buf[i].lower()

    word_count = 0
    last_start = 0
    i = 0
    while i < n:
        c = buf[i]
        if c <= " " or c == ".":
            length = i - last_start
            if length > 0:
                process(last_start, length, word_count)
                word_count += 1
                last_start = i + 1
                i += 1
        i += 1
    if last_start < n:
        process(last_start, n - last_start, word_count)
    return "".join(buf)


def make_analyzer(
    tokenizer="standard",
    lowercase: bool | None = None,
    stem: bool = False,
    minimal_stem: bool = False,
    possessive: bool = False,
    stop_words: frozenset[str] | None = None,
    phonetic: str | None = None,
    phonetic_inject: bool = True,
    compound: frozenset[str] | None = None,
    compound_longest: bool = False,
    hyphenator=None,
    fold: bool = False,
    stop: bool = True,
    ngram: tuple[int, int] | None = None,
    edge_ngram: tuple[int, int] | None = None,
    shingle: tuple[int, int] | None = None,
    shingle_unigrams: bool = True,
    cjk_bigram: bool = False,
    word_delimiter: bool = False,
    common_grams: bool = False,
    length: tuple[int, int] | None = None,
    pattern_replace: tuple[str, str] | None = None,
    stem_exclusions: frozenset[str] | None = None,
    stemmer_overrides: dict[str, str] | None = None,
    html_strip: bool = False,
    char_filters: list | None = None,
    trim: bool = False,
    keep_words: frozenset[str] | None = None,
    capitalization: bool = False,
    reverse_tokens: bool = False,
    reverse_marker: str | None = None,
    remove_duplicates: bool = False,
    limit_tokens: int | None = None,
    hyphenated_words: bool = False,
    elision: frozenset[str] | bool | None = None,
    stop_types: frozenset[str] | None = None,
    keep_types: frozenset[str] | None = None,
    position_increment: int | None = None,
    hunspell=None,
    hunspell_dedup: bool = True,
):
    """Configurable chain factory — the Analyzer extension slot
    (lucene/core/.../analysis/Analyzer.java; Solr fieldType analyzer
    binding, solr/example/solr/collection1/conf/schema.xml:421-433).

    Returns a function with the same signature as :func:`analyze`:
    text -> (terms, positions). Order mirrors the reference chains:
    tokenize -> [fold] -> lowercase (inside tokenize) -> [stop] ->
    [stem] -> [shingle]; stop removal leaves position gaps regardless
    of later filters (FilteringTokenFilter.java:49-57), and the
    stemmer/folder are arity-preserving so positions are untouched.

    ``shingle=(min, max)`` wires ShingleFilter into the chain slot
    (lucene/analysis/common/.../shingle/ShingleFilter.java): position
    holes left by the stop filter become '_' FILLER tokens
    (ShingleFilter.java:50,338-357); every position slot anchors the
    size-min..max shingles that fit before the last real token, skipping
    all-filler shingles (ShingleFilter.java:292-315); unigrams are
    emitted for real tokens only (``shingle_unigrams``, outputUnigrams);
    every output at a slot shares the slot's position (the first token
    gets posIncrement 1, the rest 0 — ShingleFilter.java:317).

    ``cjk_bigram=True`` wires the CJKAnalyzer chain (lucene/analysis/
    common/.../cjk/CJKAnalyzer.java: StandardTokenizer ->
    CJKBigramFilter -> StopFilter): consecutive CJK codepoints become
    sliding character bigrams, lone CJK chars stay unigrams, non-CJK
    tokens pass through into the usual stop/stem slots."""
    fold_fn = stem_fn = gram_fn = None
    if fold:
        from .folding import fold_to_ascii as fold_fn
    if stem and minimal_stem:
        raise ValueError("stem and minimal_stem are mutually exclusive")
    if stem == "snowball":
        # SnowballFilter language="English" (LA/snowball/SnowballFilter
        # .java + org/tartarus/snowball/ext/EnglishStemmer.java): the
        # Porter2 algorithm, distinct from the classic PorterStemFilter
        from .snowball import porter2_stem as stem_fn
    elif stem:
        from .porter import porter_stem as stem_fn
    elif minimal_stem:
        stem_fn = english_minimal_stem
    # LengthFilter (LA/miscellaneous/LengthFilter.java): drop tokens
    # outside [min,max]; a FilteringTokenFilter, so position gaps are
    # preserved exactly like stop removal.
    # PatternReplaceFilter (LA/pattern/PatternReplaceFilter.java,
    # replaceAll): in-place token rewrite, arity/position preserving.
    # KeywordMarkerFilter (LA/miscellaneous/SetKeywordMarkerFilter):
    # protected words bypass the stemmer.
    # HTMLStripCharFilter runs BEFORE the tokenizer (a CharFilter):
    # wrap the fold slot so every tokenize path sees stripped text
    # CharFilter chain (runs before the tokenizer, in schema order:
    # HTMLStrip -> mapping/pattern charfilters; the ASCII fold slot is a
    # whole-text transform so it composes at the same point, last):
    # ("mapping", {src: dst}) -> MappingCharFilter,
    # ("pattern", regex, repl) -> PatternReplaceCharFilter.
    cf_fns = []
    if html_strip:
        from .htmlstrip import strip_html

        cf_fns.append(strip_html)
    for spec in char_filters or ():
        if spec[0] == "mapping":
            cf_fns.append(make_mapping_char_filter(spec[1]))
        elif spec[0] == "pattern":
            cf_fns.append(make_pattern_replace_char_filter(spec[1], spec[2]))
        else:
            raise ValueError(f"unknown char filter {spec[0]!r}")
    if fold_fn is not None:
        cf_fns.append(fold_fn)
    if len(cf_fns) == 1:
        fold_fn = cf_fns[0]
    elif cf_fns:

        def fold_fn(t, _fns=tuple(cf_fns)):
            for f in _fns:
                t = f(t)
            return t
    pr_rx = None
    if pattern_replace is not None:
        import re as _re

        pr_rx = (_re.compile(pattern_replace[0]), pattern_replace[1])
    if (length or pattern_replace) and common_grams:
        raise ValueError(
            "length/pattern_replace cannot combine with common_grams"
        )
    if common_grams and (
        trim or keep_words or capitalization or remove_duplicates
        or limit_tokens is not None or stemmer_overrides is not None
    ):
        raise ValueError(
            "trim/keep_words/capitalization/remove_duplicates/"
            "limit_tokens/stemmer_overrides cannot combine with "
            "common_grams"
        )
    if cjk_bigram and (ngram or edge_ngram or shingle):
        raise ValueError("cjk_bigram cannot combine with gram filters")
    if word_delimiter and (
        cjk_bigram or ngram or edge_ngram or shingle
    ):
        raise ValueError(
            "word_delimiter cannot combine with cjk/gram filters"
        )
    if common_grams and (
        cjk_bigram or word_delimiter or ngram or edge_ngram or shingle
    ):
        raise ValueError(
            "common_grams cannot combine with other token-shape filters"
        )
    if ngram and edge_ngram:
        raise ValueError("ngram and edge_ngram are mutually exclusive")
    if shingle is not None:
        if ngram or edge_ngram:
            raise ValueError("shingle cannot combine with ngram filters")
        s_min, s_max = shingle
        if s_min < 2 or s_min > s_max:
            raise ValueError("shingle sizes need 2 <= min <= max")
    if ngram or edge_ngram:
        from .ngram import edge_ngram_tokens, ngram_tokens

        if ngram:
            mn, mx = ngram
            gram_fn = lambda t: ngram_tokens(t, mn, mx)  # noqa: E731
        else:
            mn, mx = edge_ngram
            gram_fn = lambda t: edge_ngram_tokens(t, mn, mx)  # noqa: E731
    # tokenizer slot (Analyzer.createComponents' Tokenizer choice):
    # "standard" (default grammar, lowercases inside tokenize_raw),
    # "whitespace" / "letter" / "keyword", or ("pattern", regex[,group]).
    # Custom tokenizers do NOT lowercase unless lowercase=True — the
    # reference's WhitespaceAnalyzer/KeywordAnalyzer have no
    # LowerCaseFilter either.
    base_tok = tokenize_raw
    if tokenizer != "standard":
        if word_delimiter or cjk_bigram or common_grams:
            raise ValueError(
                "custom tokenizer cannot combine with "
                "word_delimiter/cjk_bigram/common_grams chains"
            )
        if isinstance(tokenizer, tuple):
            if tokenizer[0] == "pattern":
                tok_fn = make_pattern_tokenizer(
                    tokenizer[1],
                    tokenizer[2] if len(tokenizer) > 2 else -1,
                )
            elif tokenizer[0] == "path":
                tok_fn = make_path_tokenizer(*tokenizer[1:])
            else:
                raise ValueError(f"unknown tokenizer {tokenizer!r}")
        else:
            tok_fn = _TOKENIZERS.get(tokenizer)
            if tok_fn is None:
                raise ValueError(f"unknown tokenizer {tokenizer!r}")
        if lowercase:
            base_tok = lambda t: tok_fn(t.lower())  # noqa: E731
        else:
            base_tok = tok_fn

    stop_set = ENGLISH_STOP_WORDS if stop_words is None else stop_words
    phon_fn = None
    if phonetic is not None:
        if ngram or edge_ngram or shingle or cjk_bigram or \
                word_delimiter or common_grams:
            raise ValueError(
                "phonetic cannot combine with gram/shape filters"
            )
        if phonetic == "double_metaphone":
            # the dedicated filter (DoubleMetaphoneFilter.java): emits
            # primary AND alternate encodings, not just primary
            from .phonetic import make_double_metaphone_filter

            phon_fn = make_double_metaphone_filter(
                inject=phonetic_inject
            )
        else:
            from .phonetic import make_phonetic_filter

            phon_fn = make_phonetic_filter(phonetic, phonetic_inject)
    comp_fn = None
    if compound is not None or hyphenator is not None:
        if ngram or edge_ngram or shingle or cjk_bigram or \
                word_delimiter or common_grams or phonetic:
            raise ValueError(
                "compound cannot combine with gram/shape/phonetic filters"
            )
        if hyphenator is not None:
            # HyphenationCompoundWordTokenFilter slot: grammar-based
            # splitting, the ``compound`` set (if any) as its dictionary
            from .hyphenation import make_hyphenation_compound_filter

            comp_fn = make_hyphenation_compound_filter(
                hyphenator,
                dictionary=compound,
                only_longest_match=compound_longest,
            )
        else:
            comp_fn = make_compound_filter(
                compound, only_longest_match=compound_longest
            )

    if hunspell is not None:
        # HunspellStemFilter slot (LA/hunspell/HunspellStemFilter.java):
        # multi-stem emission shares the phonetic/compound injector
        # slot (all three can change arity), mutually exclusive with
        # them and the gram/shape filters
        if phonetic or compound is not None or hyphenator is not None \
                or ngram or edge_ngram or shingle or cjk_bigram \
                or word_delimiter or common_grams:
            raise ValueError(
                "hunspell cannot combine with phonetic/compound/"
                "gram/shape filters"
            )
        from .hunspell import HunspellStemmer, make_hunspell_filter

        if not isinstance(hunspell, HunspellStemmer):
            hunspell = HunspellStemmer(hunspell)
        comp_fn = make_hunspell_filter(hunspell, dedup=hunspell_dedup)

    elision_set: frozenset[str] | None
    if elision is True:
        elision_set = FRENCH_ARTICLES
    elif elision:
        elision_set = frozenset(a.lower() for a in elision)
    else:
        elision_set = None
    if stop_types is not None and keep_types is not None:
        raise ValueError("stop_types and keep_types are mutually exclusive")
    type_set = keep_types if keep_types is not None else stop_types
    type_whitelist = keep_types is not None
    if type_set is not None and (common_grams or cjk_bigram):
        raise ValueError(
            "stop_types/keep_types cannot combine with "
            "common_grams/cjk_bigram chains"
        )
    if elision_set is not None and common_grams:
        raise ValueError("elision cannot combine with common_grams")

    def run(text: str) -> tuple[list[str], list[int]]:
        if common_grams == "query":
            # CommonGramsQueryFilter chain (query side of the pair):
            # grams replace covered unigrams, no stop filter — the
            # phrase-with-stopword query form the index grams serve.
            # Surviving unigrams stem exactly like the index chain's
            # (grams stay raw on both sides), so index/query pairs
            # built with the same options produce matchable terms.
            raw = tokenize_raw(fold_fn(text) if fold_fn else text)
            terms0, pos0 = common_grams_query_fold(raw, stop_set)
            if stem_fn is not None:
                terms0 = [
                    stem_fn(t) if "_" not in t else t for t in terms0
                ]
            return terms0, pos0
        if common_grams:
            # CommonGrams index chain: unigrams + '_' grams; a
            # following StopFilter (stop=True) drops the common
            # UNIGRAMS but never the grams — the CommonGrams+Stop
            # combination that makes stopword phrases queryable
            raw = tokenize_raw(fold_fn(text) if fold_fn else text)
            terms0, pos0 = common_grams_fold(raw)
            terms, positions = [], []
            for t, p in zip(terms0, pos0):
                if stop and "_" not in t and t in stop_set:
                    continue
                terms.append(stem_fn(t) if stem_fn and "_" not in t else t)
                positions.append(p)
            return terms, positions
        if word_delimiter:
            raw = tokenize_raw_wdf(
                fold_fn(text) if fold_fn else text
            )
        elif cjk_bigram:
            raw = cjk_bigram_fold(
                tokenize_raw_cjk(fold_fn(text) if fold_fn else text)
            )
        else:
            raw = base_tok(
                fold_fn(text) if fold_fn else text
            )
        if hyphenated_words:
            raw = merge_hyphenated(raw)
        # LimitTokenCountFilter (LA/miscellaneous/LimitTokenCountFilter
        # .java): consume at most N tokens straight off the tokenizer
        if limit_tokens is not None:
            raw = raw[:limit_tokens]
        terms: list[str] = []
        positions: list[int] = []
        for pos, tok in enumerate(raw):
            if type_set is not None:
                # TypeTokenFilter (LA/core/TypeTokenFilter.java:30-55):
                # a FilteringTokenFilter keyed on the TOKENIZER's type
                # attribute (assigned before any downstream mutation);
                # useWhiteList=False drops listed types, True keeps
                # only them. Dropped slots leave position gaps.
                in_set = token_type(tok) in type_set
                if in_set != type_whitelist:
                    continue
            if elision_set is not None:
                # ElisionFilter runs immediately after the tokenizer in
                # the reference chain (FrenchAnalyzer.java:194-196)
                tok = elide_token(tok, elision_set)
            if trim:
                # TrimFilter (LA/miscellaneous/TrimFilter.java): strip
                # leading/trailing whitespace in place; a token trimmed
                # to empty stays in the stream (not a FilteringFilter)
                tok = tok.strip()
            if possessive:
                tok = english_possessive(tok)
            if stop and tok in stop_set:
                continue
            if keep_words is not None and tok not in keep_words:
                # KeepWordFilter (LA/miscellaneous/KeepWordFilter.java):
                # FilteringTokenFilter — dropped slots leave position
                # gaps exactly like stop removal
                continue
            if pr_rx is not None:
                tok = pr_rx[0].sub(pr_rx[1], tok)
            if length is not None and not (
                length[0] <= len(tok) <= length[1]
            ):
                continue
            if stemmer_overrides is not None and tok in stemmer_overrides:
                # StemmerOverrideFilter (LA/miscellaneous/
                # StemmerOverrideFilter.java:54-65): dictionary hit
                # replaces the term AND sets the keyword attribute, so
                # the downstream stemmer never touches it
                tok = stemmer_overrides[tok]
            elif stem_fn and not (
                stem_exclusions and tok in stem_exclusions
            ):
                tok = stem_fn(tok)
            if capitalization:
                tok = capitalize_token(tok)
            if reverse_tokens:
                # ReverseStringFilter (LA/reverse/ReverseStringFilter
                # .java:48-80): reverse each token in place; an
                # optional marker char is PREPENDED to the reversed
                # form (the ReversedWildcardFilter convention for
                # leading-wildcard dictionaries)
                tok = tok[::-1]
                if reverse_marker is not None:
                    tok = reverse_marker + tok
            if gram_fn is not None:
                # all grams of one source token share its position
                # (NGramTokenFilter keeps posIncrement of the first gram
                # and 0 for the rest within a token in 4.x behavior)
                for g in gram_fn(tok):
                    terms.append(g)
                    positions.append(pos)
            else:
                terms.append(tok)
                positions.append(pos)
        if shingle is None:
            if phon_fn is not None:
                terms, positions = phon_fn(terms, positions)
            elif comp_fn is not None:
                terms, positions = comp_fn(terms, positions)
            if remove_duplicates:
                # RemoveDuplicatesTokenFilter (LA/miscellaneous/
                # RemoveDuplicatesTokenFilter.java): drop a token iff
                # the same term already occurred at the same position
                # (posIncrement 0 duplicates from injectors/compounds)
                seen: set[tuple[str, int]] = set()
                out_t, out_p = [], []
                for t, p in zip(terms, positions):
                    if (t, p) in seen:
                        continue
                    seen.add((t, p))
                    out_t.append(t)
                    out_p.append(p)
                return out_t, out_p
            return terms, positions
        if not terms:
            return [], []
        # ShingleFilter over the surviving stream: '_' fillers occupy
        # the stop-filter's position holes (incl. leading ones)
        maxp = positions[-1]
        slots = ["_"] * (maxp + 1)
        for t, p in zip(terms, positions):
            slots[p] = t
        real = [False] * (maxp + 1)
        for p in positions:
            real[p] = True
        out_t: list[str] = []
        out_p: list[int] = []
        for s in range(maxp + 1):
            if shingle_unigrams and real[s]:
                out_t.append(slots[s])
                out_p.append(s)
            for size in range(s_min, s_max + 1):
                e = s + size
                if e > maxp + 1:
                    break
                window = slots[s:e]
                if not any(real[s:e]):
                    continue  # all-filler shingles are never emitted
                out_t.append(" ".join(window))
                out_p.append(s)
        return out_t, out_p

    if position_increment is None:
        return run

    def run_posfilter(text: str) -> tuple[list[str], list[int]]:
        # PositionFilter (lucene/analysis/common/.../position/
        # PositionFilter.java:58-76): the first token keeps its
        # original increment; every later token's increment is forced
        # to ``positionIncrement`` (default 0) — the query-side flatten
        # used with shingles so the parser yields a boolean, not a
        # cross-position phrase.
        t, p = run(text)
        if not t:
            return t, p
        base = p[0]
        return t, [base + i * position_increment for i in range(len(t))]

    return run_posfilter


# ---- UAX29URLEmailTokenizer ----------------------------------------
# (lucene/analysis/common/.../standard/UAX29URLEmailTokenizer.java:
# 40-85 + UAX29URLEmailTokenizerImpl.jflex): StandardTokenizer rules
# plus single-token <URL> and <EMAIL> emissions.  This is the
# practically-used subset of the RFC grammar: scheme://host/path...
# and www.-prefixed URLs, and local@domain emails; the full jflex
# grammar additionally covers IP-literal hosts and bare registered
# domains, which the transcripts corpus never exercises.
_UE_EMAIL = r"[A-Za-z0-9_]+(?:[.+\-][A-Za-z0-9_]+)*@[A-Za-z0-9]+(?:[.\-][A-Za-z0-9]+)+"
_UE_URL = (
    r"(?:(?:https?|ftp)://|www\.)[A-Za-z0-9\-]+(?:\.[A-Za-z0-9\-]+)*"
    r"(?::[0-9]+)?(?:/[^\s\])>\"']*)?(?:\?[^\s\])>\"']*)?"
)
_UE_WORD = r"[A-Za-z0-9_]+(?:[.'][A-Za-z0-9_]+)*"
_UE_RE = re.compile(
    f"(?P<email>{_UE_EMAIL})|(?P<url>{_UE_URL})|(?P<word>{_UE_WORD})"
)


def tokenize_url_email_typed(
    text: str,
) -> tuple[list[str], list[str]]:
    """(terms, types): <URL>/<EMAIL> kept whole, everything else via
    the standard word rule typed <NUM>/<ALPHANUM>.  Case preserved —
    lowercasing is the downstream LowerCaseFilter's job, exactly as in
    the reference chain."""
    terms: list[str] = []
    types: list[str] = []
    for m in _UE_RE.finditer(text):
        tok = m.group()
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        terms.append(tok)
        if m.lastgroup == "email":
            types.append("<EMAIL>")
        elif m.lastgroup == "url":
            types.append("<URL>")
        else:
            types.append(token_type(tok))
    return terms, types


def tokenize_url_email(text: str) -> list[str]:
    return tokenize_url_email_typed(text)[0]


_TOKENIZERS["url_email"] = tokenize_url_email
