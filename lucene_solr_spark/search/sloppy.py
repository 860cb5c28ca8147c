"""Sloppy phrase matching — SloppyPhraseScorer semantics, re-implemented.

Reference: lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseScorer.java:75-105 (phraseFreq), PhrasePositions.java:72-74
(position = raw position - query offset), PhraseQueue.java lessThan
(order by position, then offset). Slop factor 1/(distance+1):
lucene/core/.../search/similarities/BM25Similarity.java:70-73 sloppyFreq.

Semantics replicated exactly for phrases WITHOUT repeated terms: the
greedy min-advancing walk scores each locally-minimized match window once
— including its documented asymmetries ("a b"~2 matching "x a b a y"
twice). Repeated-term phrases (hasRpts path, SloppyPhraseScorer.java:
106-215) are rejected with NotImplementedError in v1.

freq accumulates in float32, matching Lucene's float arithmetic.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd


def sloppy_freq(plists: list[np.ndarray], slop: int) -> float:
    """phraseFreq for one document.

    ``plists[i]`` = sorted adjusted positions (raw - i) of clause i; all
    lists non-empty. Returns the float32-accumulated sloppy frequency
    (0.0 if no window within slop).
    """
    n = len(plists)
    if n == 1:
        # degenerate 1-clause phrase: every position is a zero-width
        # match, slop factor 1/(0+1) — freq == tf. (Lucene rewrites this
        # to TermQuery before scoring; kept as a guard for direct calls.)
        return float(len(plists[0]))
    ptrs = [0] * n
    end = None
    heap = []
    for i, arr in enumerate(plists):
        p = int(arr[0])
        heap.append((p, i))
        if end is None or p > end:
            end = p
    heapq.heapify(heap)
    freq = np.float32(0.0)
    pos, ti = heapq.heappop(heap)
    match_length = end - pos
    next_pos = heap[0][0]
    while True:
        # advancePP (SloppyPhraseScorer.java:107-115)
        ptrs[ti] += 1
        arr = plists[ti]
        if ptrs[ti] >= len(arr):
            break
        p = int(arr[ptrs[ti]])
        if p > end:
            end = p
        if p > next_pos:  # done minimizing current match-length
            if match_length <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_length + 1)
                )
            heapq.heappush(heap, (p, ti))
            pos, ti = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - pos
        else:
            ml2 = end - p
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(
            freq + np.float32(1.0) / np.float32(match_length + 1)
        )
    return float(freq)


def sloppy_freq_partitions(n_clauses: int, slop: int):
    """mapInPandas kernel over rows (doc_id, clause, positions, norm_byte)
    hash-partitioned by doc_id and sorted by (doc_id, clause); a doc's
    rows never cross partitions, but may cross Arrow batches (carried)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            out_doc, out_tf, out_nb = [], [], []
            for doc_id, g in pdf.groupby("doc_id", sort=False):
                if g["clause"].nunique() != n_clauses:
                    continue  # missing a term -> no phrase candidate
                plists = [None] * n_clauses
                for cl, plist in zip(g["clause"], g["positions"]):
                    plists[int(cl)] = np.asarray(plist, dtype=np.int64) - int(cl)
                f = sloppy_freq(plists, slop)
                if f > 0.0:
                    out_doc.append(int(doc_id))
                    out_tf.append(f)
                    out_nb.append(int(g["norm_byte"].iloc[0]))
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "tf": pd.Series(out_tf, dtype="float64"),
                    "norm_byte": pd.Series(out_nb, dtype="int32"),
                }
            )

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            last_doc = pdf["doc_id"].iloc[-1]
            tail = (pdf["doc_id"].to_numpy() == last_doc)[::-1]
            n_tail = int(np.argmin(tail)) if not tail.all() else len(pdf)
            head = pdf.iloc[: len(pdf) - n_tail]
            carry = pdf.iloc[len(pdf) - n_tail :]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    return run
