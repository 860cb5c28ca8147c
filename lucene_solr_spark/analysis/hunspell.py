"""Hunspell dictionary-based stemming — affix-rule stem discovery.

Reference mapping (lucene/analysis/common/src/java/org/apache/lucene/
analysis/hunspell/):
  - HunspellDictionary.java:182-270: ``.aff`` parsing — ``PFX``/``SFX``
    headers carry (flag, crossProduct Y/N, count); each rule line is
    (flag, strip, append[/appendFlags], condition); strip ``0`` means
    empty; the condition becomes the regex ``.*%s`` for suffixes and
    ``%s.*`` for prefixes, matched against the STRIPPED word
    (HunspellAffix.java:44-46).  ``.dic`` lines are ``word/flags``.
  - HunspellStemmer.java:72-79: a word that is itself a dictionary
    entry is one of its own stems; affix-derived stems are appended.
  - HunspellStemmer.java:114-167 (stem) + 177-204 (applyAffix): strip
    a matching suffix append (adding back the strip chars), check the
    condition on the stripped word, accept iff the dictionary entry
    for the stripped word carries the rule's flag; prefixes analogous.
    Cross-product rules recurse (RECURSION_CAP = 2) with the rule's
    appendFlags as the cross-check set (``null`` = allow all,
    HunspellStemmer.java:210-212).
  - HunspellStemFilter.java:75-108: no stems -> original token passes
    unchanged; otherwise the token is REPLACED by the first stem and
    the remaining (dedup'd, uniqueStems) stems are emitted at the same
    position (posIncrement 0).

This is a from-scratch re-implementation of the published Hunspell
affix semantics over plain Python dicts; the analyzer chain applies it
via vectorized Arrow batches like every other filter (no per-row
Python in Spark hot paths — the stemmer runs inside the same
mapInPandas tokenize kernel).
"""

from __future__ import annotations

import re

_RECURSION_CAP = 2


class HunspellAffix:
    __slots__ = (
        "flag", "strip", "append", "append_flags", "condition_re",
        "cross_product",
    )

    def __init__(self, flag, strip, append, append_flags,
                 condition_re, cross_product):
        self.flag = flag
        self.strip = strip
        self.append = append
        self.append_flags = append_flags  # frozenset | None
        self.condition_re = condition_re
        self.cross_product = cross_product


class HunspellDictionary:
    """Parsed ``.aff`` rules + ``.dic`` word/flag entries.

    ``words``: word -> tuple of flag-sets (a word may repeat in the
    ``.dic`` with different flag sets, HunspellDictionary.java:445-468).
    ``prefixes``/``suffixes``: append-string -> list[HunspellAffix].
    """

    def __init__(self, aff_text: str, dic_text: str,
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.prefixes: dict[str, list[HunspellAffix]] = {}
        self.suffixes: dict[str, list[HunspellAffix]] = {}
        self._parse_aff(aff_text)
        self.words: dict[str, tuple[frozenset, ...]] = {}
        self._parse_dic(dic_text)
        # bounded set of append lengths -> O(#lengths) dict probes per
        # token instead of scanning every distinct append string (the
        # reference builds a CharArrayMap keyed by append for the same
        # reason, HunspellDictionary.java:260-268)
        self.suffix_lens = sorted(
            {len(a) for a in self.suffixes if a}, reverse=True
        )
        self.prefix_lens = sorted(
            {len(a) for a in self.prefixes if a}, reverse=True
        )

    # -- parsing ------------------------------------------------------

    def _parse_aff(self, text: str) -> None:
        lines = [
            ln.strip() for ln in text.splitlines()
            if ln.strip() and not ln.lstrip().startswith("#")
        ]
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            if parts[0] in ("PFX", "SFX") and len(parts) >= 4:
                kind, flag, cross, count = (
                    parts[0], parts[1], parts[2] == "Y", int(parts[3])
                )
                fmt_suffix = kind == "SFX"
                for j in range(1, count + 1):
                    args = lines[i + j].split()
                    # args: PFX/SFX flag strip append [condition]
                    strip = "" if args[2] == "0" else args[2]
                    append_arg = args[3]
                    append_flags = None
                    if "/" in append_arg:
                        append_arg, _, flagpart = append_arg.rpartition("/")
                        append_flags = frozenset(flagpart)
                    append = "" if append_arg == "0" else append_arg
                    cond = args[4] if len(args) > 4 else "."
                    pattern = (
                        f".*{cond}" if fmt_suffix else f"{cond}.*"
                    )
                    affix = HunspellAffix(
                        flag, strip, append, append_flags,
                        re.compile(pattern), cross,
                    )
                    table = (
                        self.suffixes if fmt_suffix else self.prefixes
                    )
                    table.setdefault(append, []).append(affix)
                i += count + 1
            else:
                i += 1

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 0
        if lines and lines[0].strip().isdigit():
            start = 1  # leading entry-count line
        for ln in lines[start:]:
            ln = ln.strip()
            if not ln:
                continue
            word, _, flagpart = ln.partition("/")
            if self.ignore_case:
                word = word.lower()
            flags = frozenset(flagpart)
            self.words.setdefault(word, ())
            self.words[word] = self.words[word] + (flags,)

    # -- lookups ------------------------------------------------------

    def lookup_word(self, word: str):
        return self.words.get(word)

    def has_flag(self, word: str, flag: str) -> bool:
        entries = self.words.get(word)
        return entries is not None and any(flag in fs for fs in entries)


class HunspellStemmer:
    """HunspellStemmer.java:62-212 — stem discovery over the parsed
    dictionary; ``unique_stems`` preserves first-seen order like the
    reference's CharArraySet walk."""

    def __init__(self, dictionary: HunspellDictionary):
        self.dic = dictionary

    def stem(self, word: str) -> list[str]:
        if self.dic.ignore_case:
            word = word.lower()
        stems: list[str] = []
        if self.dic.lookup_word(word) is not None:
            stems.append(word)
        stems.extend(self._stem(word, None, 0))
        return stems

    def unique_stems(self, word: str) -> list[str]:
        seen: set[str] = set()
        out: list[str] = []
        for s in self.stem(word):
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    def _stem(self, word: str, flags, depth: int) -> list[str]:
        stems: list[str] = []
        n = len(word)
        for ln in self.dic.suffix_lens:
            if ln > n:
                continue
            rules = self.dic.suffixes.get(word[n - ln:])
            if rules is None:
                continue
            for sfx in rules:
                if flags is not None and sfx.flag not in flags:
                    continue
                stripped = word[: n - ln] + sfx.strip
                stems.extend(self._apply(stripped, sfx, depth))
        for ln in self.dic.prefix_lens:
            if ln > n:
                continue
            rules = self.dic.prefixes.get(word[:ln])
            if rules is None:
                continue
            for pfx in rules:
                if flags is not None and pfx.flag not in flags:
                    continue
                stripped = pfx.strip + word[ln:]
                stems.extend(self._apply(stripped, pfx, depth))
        return stems

    def _apply(self, stripped: str, affix: HunspellAffix,
               depth: int) -> list[str]:
        if self.dic.ignore_case:
            stripped = stripped.lower()
        if not affix.condition_re.fullmatch(stripped):
            return []
        stems: list[str] = []
        entries = self.dic.lookup_word(stripped)
        if entries is not None:
            for fs in entries:
                if affix.flag in fs:
                    stems.append(stripped)
        if affix.cross_product and depth < _RECURSION_CAP:
            stems.extend(
                self._stem(stripped, affix.append_flags, depth + 1)
            )
        return stems


def make_hunspell_filter(stemmer: HunspellStemmer, dedup: bool = True):
    """HunspellStemFilter.java:75-108 as a (terms, positions) ->
    (terms, positions) chain stage: unknown words pass through; known
    words are replaced by their stems, extra stems share the slot's
    position (posIncrement 0)."""

    def apply(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            stems = (
                stemmer.unique_stems(t) if dedup else stemmer.stem(t)
            )
            if not stems:
                out_t.append(t)
                out_p.append(p)
            else:
                for s in stems:
                    out_t.append(s)
                    out_p.append(p)
        return out_t, out_p

    return apply
