"""Byte-pair-encoding tokenizer: train + encode, Spark-first.

The shape every production tokenizer trainer uses (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units";
HuggingFace tokenizers' BPE trainer): the CORPUS-scale work is a word
frequency count — one lowercase+regexp projection, one explode, one
groupBy — and the merge learning then runs over the (distinct word,
freq) dictionary, which is tiny relative to the corpus (a 100 TB text
corpus holds ~10^7 distinct words ≈ a few hundred MB on the driver;
the 10^12 tokens never leave the executors). Encoding broadcasts the
learned merge ranks and runs as a map-only Arrow batch with a
per-batch distinct-word memo, so each unique word in a batch is
BPE-walked once no matter how often it repeats.

No reference-engine counterpart: this is LLM-training-pipeline
tooling (token counting / sequence budgeting) over the same corpus
the engine indexes.
"""

from __future__ import annotations

import re
from typing import Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

END = "</w>"  # Sennrich end-of-word marker
_WORD_RE = r"[a-z0-9]+"


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distributed (word, freq) over lowercased [a-z0-9]+ runs — the
    only corpus-scale stage of BPE training: one narrow projection and
    one groupBy (map-side partial aggregation makes the shuffle carry
    distinct words per partition, not tokens)."""
    words = docs.select(
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)"
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _pair_counts(vocab: dict) -> dict:
    counts: dict = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if (
            i < len(syms) - 1
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 40,
    text_col: str = "text",
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules. Deterministic: the winning pair
    each round is (max total freq, then lexicographically smallest) —
    a stable tie-break so retraining anywhere reproduces the table
    bit-for-bit. Stops early when no pair reaches ``min_freq``."""
    wc = word_counts(docs, text_col).collect()
    vocab = {
        tuple(r["word"]) + (END,): int(r["freq"]) for r in wc
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        top = max(counts.values())
        if top < min_freq:
            break
        pair = min(p for p, c in counts.items() if c == top)
        merges.append(pair)
        vocab = {
            _merge_word(s, pair): f for s, f in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict) -> list[str]:
    """Standard BPE encode of one word: repeatedly apply the
    lowest-rank applicable merge until none applies."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        pairs = {
            (syms[i], syms[i + 1])
            for i in range(len(syms) - 1)
        }
        ranked = [
            (ranks[p], p) for p in pairs if p in ranks
        ]
        if not ranked:
            break
        _, pair = min(ranked)
        syms = _merge_word(syms, pair)
    return list(syms)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    preview_tokens: int = 8,
) -> DataFrame:
    """Per-document token accounting under the learned merges:
    (id, n_words, n_tokens, preview). Map-only Arrow batches; the
    merge table rides the closure (broadcast-sized: vocab_size
    entries), and a per-batch memo BPE-walks each distinct word once.
    ``preview`` carries the first ``preview_tokens`` tokens so gates
    value-check actual segmentations, not just counts."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    word_re = re.compile(_WORD_RE)
    npv = int(preview_tokens)

    def run(batches: Iterable["pd.DataFrame"]):
        memo: dict = {}

        def enc(word: str) -> list[str]:
            toks = memo.get(word)
            if toks is None:
                toks = encode_word(word, ranks)
                memo[word] = toks
            return toks

        for pdf in batches:
            if not len(pdf):
                continue
            ids, nw, nt, pv = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                words = word_re.findall((txt or "").lower())
                toks: list[str] = []
                n_tok = 0
                for w in words:
                    t = enc(w)
                    n_tok += len(t)
                    if len(toks) < npv:
                        toks.extend(t)
                ids.append(int(i))
                nw.append(len(words))
                nt.append(n_tok)
                pv.append(" ".join(toks[:npv]))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "n_tokens": nt,
                    "preview": pv,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} long, n_words int, n_tokens int, preview string",
    )
