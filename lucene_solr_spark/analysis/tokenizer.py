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
    """
    out_doc: list = []
    out_term: list[str] = []
    out_tf: list[int] = []
    out_pos: list[list[int]] = []
    out_dl: list[int] = []
    analyzer = analyzer or analyze
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


def make_analyzer(
    stem: bool = False, fold: bool = False, stop: bool = True
):
    """Configurable chain factory — the Analyzer extension slot
    (lucene/core/.../analysis/Analyzer.java; Solr fieldType analyzer
    binding, solr/example/solr/collection1/conf/schema.xml:421-433).

    Returns a function with the same signature as :func:`analyze`:
    text -> (terms, positions). Order mirrors the reference chains:
    tokenize -> [fold] -> lowercase (inside tokenize) -> [stop] ->
    [stem]; stop removal leaves position gaps regardless of later
    filters (FilteringTokenFilter.java:49-57), and the stemmer/folder
    are arity-preserving so positions are untouched.
    """
    fold_fn = stem_fn = None
    if fold:
        from .folding import fold_to_ascii as fold_fn
    if stem:
        from .porter import porter_stem as stem_fn

    def run(text: str) -> tuple[list[str], list[int]]:
        raw = tokenize_raw(
            fold_fn(text) if fold_fn else text
        )
        terms: list[str] = []
        positions: list[int] = []
        for pos, tok in enumerate(raw):
            if stop and tok in ENGLISH_STOP_WORDS:
                continue
            terms.append(stem_fn(tok) if stem_fn else tok)
            positions.append(pos)
        return terms, positions

    return run
