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


_ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
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
