"""HyphenationCompoundWordTokenFilter — the grammar-based half of
compound splitting (reference: lucene/analysis/common/src/java/org/
apache/lucene/analysis/compound/HyphenationCompoundWordTokenFilter.java
:168-236 decompose(); hyphenation/HyphenationTree.java:315-405
hyphenate()). The reference loads OFFO XML grammars of Liang's TeX
hyphenation patterns (F. M. Liang, "Word Hy-phen-a-tion by Com-put-er",
Stanford 1983 — the published public algorithm); here patterns are
passed as plain strings ('hy3ph', '1scan', ...) plus optional exception
words ('ta-ble'), and the pattern automaton is a dict-keyed scan —
the token-level behavior (which subwords come out, at what positions)
is what parity demands, not the XML loader.

Semantics pinned to the reference:

* hyphenate(word, remain=1, push=1): interior break at letter index i
  (1-based boundary count) iff the max interleaved pattern digit at
  that boundary is ODD and remain <= i <= len-push
  (HyphenationTree.java:384-391); exception words bypass the patterns
  (stoplist, :354-368); a word with no interior break hyphenates to
  None and decompose() emits NOTHING for it (:173-175).
* the returned point list gets synthetic 0 and len endpoints
  (:393-402), and decompose() walks every point pair (start, end)
  whose length fits [minSubwordSize, maxSubwordSize], emitting the
  substring when the dictionary holds it — or, failing that, the
  substring one char shorter (German binding 's', :203-229); with no
  dictionary every fitting point pair is emitted. onlyLongestMatch
  keeps the longest match per start point.
* CompoundWordTokenFilterBase: the original token always passes
  through, subwords follow at the SAME position (posIncrement 0), and
  tokens shorter than minWordSize are never decomposed.
"""

from __future__ import annotations


class HyphenationTree:
    """Liang pattern hyphenator (HyphenationTree.java:315-405).

    ``patterns``: TeX-style strings mixing letters and digit weights
    ('hy3ph', '4te.', '.ta4'); '.' anchors word start/end exactly as in
    the TeX/OFFO grammars. ``exceptions``: words with explicit breaks
    ('ta-ble'), checked before the patterns (the stoplist path).
    """

    def __init__(
        self,
        patterns: list[str],
        exceptions: list[str] | None = None,
    ):
        # pattern -> (letters, [(boundary_offset, digit), ...])
        self._by_letters: dict[str, list[tuple[int, int]]] = {}
        for pat in patterns:
            letters = []
            digits: list[tuple[int, int]] = []
            pos = 0
            for ch in pat:
                if ch.isdigit():
                    digits.append((pos, int(ch)))
                else:
                    letters.append(ch.lower())
                    pos += 1
            key = "".join(letters)
            self._by_letters.setdefault(key, []).extend(digits)
        self._max_len = max(
            (len(k) for k in self._by_letters), default=0
        )
        self._exceptions: dict[str, list[int]] = {}
        for w in exceptions or ():
            bare = w.replace("-", "").lower()
            pts = []
            n = 0
            for part in w.split("-")[:-1]:
                n += len(part)
                pts.append(n)
            self._exceptions[bare] = pts

    def hyphenate(
        self, word: str, remain: int = 1, push: int = 1
    ) -> list[int] | None:
        """Interior break positions (letters before the break), or None
        when the word has none / is too short / is not all letters —
        the reference returns null for each of those (:327-348,393)."""
        word = word.lower()
        n = len(word)
        if n < remain + push or not word.isalpha():
            return None
        exc = self._exceptions.get(word)
        if exc is not None:
            pts = [i for i in exc if remain <= i < n - push + 1]
            return pts or None
        wrapped = "." + word + "."
        # vals[k] = max digit between wrapped[k-1] and wrapped[k]
        vals = [0] * (len(wrapped) + 1)
        for s in range(len(wrapped)):
            for L in range(1, min(self._max_len, len(wrapped) - s) + 1):
                digs = self._by_letters.get(wrapped[s : s + L])
                if digs:
                    for off, d in digs:
                        if vals[s + off] < d:
                            vals[s + off] = d
        pts = [
            i
            for i in range(1, n)
            # break before word[i] == wrapped boundary i+1
            if vals[i + 1] % 2 == 1 and remain <= i <= n - push
        ]
        return pts or None


def make_hyphenation_compound_filter(
    tree: HyphenationTree,
    dictionary=None,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
):
    """Token-filter slot mirroring make_compound_filter's contract:
    (terms, positions) -> (terms, positions), original first, subwords
    at posIncrement 0 (HyphenationCompoundWordTokenFilter.java:168-236,
    CompoundWordTokenFilterBase.java:104-130)."""
    dict_set = frozenset(dictionary) if dictionary is not None else None

    def decompose(t: str) -> list[str]:
        pts = tree.hyphenate(t, 1, 1)
        if pts is None:
            return []
        hyp = [0] + pts + [len(t)]
        out: list[str] = []
        for i in range(len(hyp)):
            start = hyp[i]
            longest: str | None = None
            for j in range(1, len(hyp) - i):
                part_len = hyp[i + j] - start
                if part_len > max_subword_size:
                    break
                if part_len < min_subword_size:
                    continue
                sub = t[start : start + part_len]
                if dict_set is None or sub in dict_set:
                    if only_longest_match:
                        if longest is None or len(longest) < len(sub):
                            longest = sub
                    else:
                        out.append(sub)
                elif sub[:-1] in dict_set:
                    # one shorter: genitive-'s' / binding chars
                    # (reference :203-229; bounds NOT rechecked there)
                    if only_longest_match:
                        if longest is None or len(longest) < part_len - 1:
                            longest = sub[:-1]
                    else:
                        out.append(sub[:-1])
            if only_longest_match and longest is not None:
                out.append(longest)
        return out

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
            for sub in decompose(t):
                out_t.append(sub)
                out_p.append(p)
        return out_t, out_p

    return run
