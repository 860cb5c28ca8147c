"""Phonetic encoders + PhoneticFilter — the lucene/analysis/phonetic
module re-created without the commons-codec dependency.

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java (inject=true emits the phonetic token at
the same position as the original; false replaces it), with encoders
from commons-codec named by PhoneticFilterFactory (Soundex,
RefinedSoundex, Metaphone, DoubleMetaphone, Caverphone).

Implemented encoders: American Soundex and Refined Soundex, as exact
step pipelines (strip -> H/W transparency -> letter->digit translate ->
adjacent-collapse -> vowel-zero strip -> pad) so the DuckDB oracle twin
can mirror them operation-for-operation. Soundex variants genuinely
differ on first-letter collapse; this one collapses ACROSS the first
letter (the archival/Wikipedia variant: Pfister -> P236), pinned by
tests. Metaphone/DoubleMetaphone rule tables are declared out of scope
— the filter slot and the encoder contract are what the engine
re-creates.
"""

from __future__ import annotations

# letter -> digit code, A..Z (American Soundex)
SOUNDEX_MAP = "01230120022455012623010202"
# letter -> digit code, A..Z (Refined Soundex)
REFINED_MAP = "01360240043788015936020505"


def _clean(s: str) -> str:
    return "".join(c for c in s.upper() if "A" <= c <= "Z")


def _collapse(s: str) -> str:
    out = []
    for c in s:
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def soundex(s: str) -> str:
    """American Soundex, 4 chars (letter + 3 digits, zero-padded):
    H/W are transparent for adjacency (Ashcraft -> A261), vowels
    separate equal codes (Tymczak -> T522), adjacent equal codes
    collapse including the first letter's own code (Pfister ->
    P236)."""
    clean = _clean(s)
    if not clean:
        return ""
    head = clean[0]
    tail = "".join(c for c in clean[1:] if c not in "HW")
    digits = "".join(
        SOUNDEX_MAP[ord(c) - 65] for c in head + tail
    )
    rest = _collapse(digits)[1:].replace("0", "")
    return head + (rest + "000")[:3]


def refined_soundex(s: str) -> str:
    """Refined Soundex (commons-codec RefinedSoundex.java): first
    letter + the full adjacent-collapsed code string, vowel zeros
    retained, no length cap (testing -> T6036084)."""
    clean = _clean(s)
    if not clean:
        return ""
    digits = "".join(REFINED_MAP[ord(c) - 65] for c in clean)
    return clean[0] + _collapse(digits)


# Caverphone 2.0 replacement program (David Hood, Caversham Project,
# 2004 revision — the encoder PhoneticFilterFactory names "Caverphone").
# Ordered (pattern, replacement) regex steps after lowercasing and
# stripping non-letters; '^'/'$' anchors per the spec's
# "beginning/end of the name" wording.
_CAVERPHONE_STEPS = [
    ("e$", ""),
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^trough", "trou2f"), ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"),
    ("j", "y"), ("^y3", "Y3"), ("^y", "A"), ("y", "3"),
    ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"),
    ("f+", "F"), ("m+", "M"), ("n+", "N"),
    ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"), ("w", "2"),
    ("^h", "A"), ("h", "2"),
    ("r3", "R3"), ("r$", "3"), ("r", "2"),
    ("l3", "L3"), ("l$", "3"), ("l", "2"),
    ("2", ""),
    ("3$", "A"), ("3", ""),
]


def caverphone2(s: str) -> str:
    """Caverphone 2.0 (Hood 2004, the Caversham Project): the ordered
    replacement program over the lowercased letters, padded with '1'
    to 10 characters. Pinned by the spec's own examples
    (Peter -> PTA1111111, Stevenson -> STFNSN1111)."""
    import re as _re

    t = "".join(c for c in s.lower() if "a" <= c <= "z")
    if not t:
        return ""
    for pat, rep in _CAVERPHONE_STEPS:
        t = _re.sub(pat, rep, t)
    return (t + "1" * 10)[:10]


_ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "caverphone": caverphone2,
}


def make_phonetic_filter(encoder: str = "soundex", inject: bool = True):
    """PhoneticFilter.java: per token emit the encoding — alongside the
    original at the same position when ``inject``, replacing it
    otherwise. Returns (terms, positions) -> (terms, positions)."""
    enc = _ENCODERS.get(encoder)
    if enc is None:
        raise ValueError(f"unknown phonetic encoder {encoder!r}")

    def run(
        terms: list[str], positions: list[int]
    ) -> tuple[list[str], list[int]]:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            code = enc(t)
            if inject:
                out_t.append(t)
                out_p.append(p)
                if code and code != t:
                    out_t.append(code)
                    out_p.append(p)
            else:
                out_t.append(code if code else t)
                out_p.append(p)
        return out_t, out_p

    return run
