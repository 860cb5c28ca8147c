"""Snowball English stemmer ("Porter2") — the SnowballFilter language
most Solr `text_en` schemas bind.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
snowball/SnowballFilter.java (filter slot) driving the generated
org/tartarus/snowball/ext/EnglishStemmer.java. This is a fresh
implementation of the PUBLISHED Porter2 specification
(snowballstem.org "The English (Porter2) stemming algorithm"), not a
translation of the generated Java: regions and steps follow the spec
text directly.

Differences from the classic Porter stemmer in ``porter.py``: an
exception list, the R1/R2 region formulation, the "short word" e-restore
rule, li-endings, and revised step-2/3 suffix tables.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# exceptional forms (spec §"exceptional forms"): stem directly
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# invariant after step 1a (spec §"exceptional forms (part 2)")
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# R1 override prefixes (spec: "If the words begins gener, commun or
# arsen, set R1 to be the remainder of the word.")
_R1_PREFIXES = ("gener", "commun", "arsen")


def _is_vowel(w: str, i: int) -> bool:
    # 'Y' marks a consonant y
    return w[i] in _VOWELS


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets: R1 = after the first non-vowel following
    a vowel; R2 = same definition applied inside R1."""
    n = len(w)
    r1 = n
    for p in _R1_PREFIXES:
        if w.startswith(p):
            r1 = len(p)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    """Short syllable: (a) vowel + non-vowel other than w/x/Y preceded
    by a non-vowel, at the end; or (b) the whole word is vowel +
    non-vowel."""
    n = len(w)
    if n == 2:
        return _is_vowel(w, 0) and not _is_vowel(w, 1)
    if n >= 3:
        return (
            not _is_vowel(w, n - 3)
            and _is_vowel(w, n - 2)
            and not _is_vowel(w, n - 1)
            and w[n - 1] not in "wxY"
        )
    return False


def _has_vowel(w: str) -> bool:
    return any(_is_vowel(w, i) for i in range(len(w)))


def porter2_stem(word: str) -> str:
    """Stem one lowercase word with the English (Porter2) algorithm."""
    w = word
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    exc = _EXCEPTIONS1.get(w)
    if exc is not None:
        return exc

    # mark consonant y's as 'Y' (initial y, or y after a vowel)
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    w = "".join(chars)

    r1, r2 = _regions(w)

    # Step 0: longest of ' / 's / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if any(_is_vowel(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w

    # Step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _has_vowel(stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel which is not the
    # first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    # Step 2 (in R1): longest suffix, single condition check
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    )
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 3 (in R1)
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", None),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (in R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    )
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")


def _is_short(w: str, r1: int) -> bool:
    """Word is short: ends in a short syllable AND R1 is null."""
    return r1 >= len(w) and _ends_short_syllable(w)
