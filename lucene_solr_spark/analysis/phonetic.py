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
tests. Caverphone 2.0 is the Hood 2004 replacement program. Metaphone
(Philips 1990) and Double Metaphone (Philips 2000, primary+alternate)
are implemented from the published rule sets — the encoders
PhoneticFilterFactory/DoubleMetaphoneFilterFactory default to — and
pinned by the reference's own DoubleMetaphoneFilterTest vectors
(international -> ANTR / ANTRNXNL at len 8, Kuczewski -> KSSK+KXFS,
non-alphabetic tokens pass through unencoded).
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


_VOWELS = "AEIOU"


def metaphone(s: str, max_len: int = 4) -> str:
    """Metaphone (Lawrence Philips, Computer Language 12/1990) — the
    encoder PhoneticFilterFactory names "Metaphone", default code
    length 4. Published rule set: initial-cluster rewrites (KN- GN- PN-
    AE- WR- drop the first letter, X- sounds as S, WH- as W), vowels
    kept only word-initially, and per-letter context rules (CH -> X,
    CI/CE/CY -> S, DGE/DGI/DGY -> J, GH silent unless sounding K, PH
    -> F, SH/SIO/SIA -> X, TH -> 0, TIO/TIA -> X, V -> F, X -> KS,
    Z -> S, silent B in -MB, silent K in CK, W/Y dropped without a
    following vowel)."""
    txt = _clean(s)
    n = len(txt)
    if n == 0:
        return ""
    if n == 1:
        return txt
    two = txt[:2]
    if two in ("KN", "GN", "PN", "AE", "WR"):
        txt = txt[1:]
    elif txt[0] == "X":
        txt = "S" + txt[1:]
    elif two == "WH":
        txt = "W" + txt[2:]
    n = len(txt)

    def at(i: int) -> str:
        return txt[i] if 0 <= i < n else ""

    def is_vowel(i: int) -> bool:
        ch = at(i)
        return ch != "" and ch in _VOWELS

    def at_in(i: int, chars: str) -> bool:
        ch = at(i)
        return ch != "" and ch in chars

    code: list[str] = []
    i = 0
    while i < n and len(code) < max_len:
        c = txt[i]
        if c != "C" and i > 0 and txt[i - 1] == c:
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            if not (i == n - 1 and at(i - 1) == "M"):
                code.append("B")
        elif c == "C":
            if (
                at(i - 1) == "S"
                and i + 1 < n
                and at_in(i + 1, "IEY")
            ):
                pass  # SCI/SCE/SCY: the C is silent after S
            elif txt[i : i + 3] == "CIA":
                code.append("X")
            elif i + 1 < n and at_in(i + 1, "IEY"):
                code.append("S")
            elif at(i - 1) == "S" and at(i + 1) == "H":
                code.append("K")  # SCH
            elif at(i + 1) == "H":
                if i == 0 and n >= 3 and not is_vowel(2):
                    code.append("K")  # CHR- etc: hard CH
                else:
                    code.append("X")
            else:
                code.append("K")
        elif c == "D":
            if at(i + 1) == "G" and at_in(i + 2, "IEY"):
                code.append("J")
                i += 2
            else:
                code.append("T")
        elif c == "G":
            silent = False
            if at(i + 1) == "H":
                if not (i + 2 >= n or is_vowel(i + 2)):
                    silent = True  # -GH- not before a vowel
            if i + 1 == n - 1 and at(i + 1) == "N":
                silent = True  # -GN
            elif txt[i + 1 : i + 4] == "NED" and i + 4 == n:
                silent = True  # -GNED
            if at(i - 1) == "D" and at_in(i + 1, "IEY"):
                silent = True  # DGE/DGI/DGY handled at D
            if not silent:
                if at_in(i + 1, "IEY") and at(i - 1) != "G":
                    code.append("J")
                else:
                    code.append("K")
        elif c == "H":
            if is_vowel(i - 1) and not is_vowel(i + 1):
                pass  # silent: vowel-H-consonant
            elif at_in(i - 1, "CSPTG"):
                pass  # the digraph consumed the H
            else:
                code.append("H")
        elif c in "FJLMNR":
            code.append(c)
        elif c == "K":
            if at(i - 1) != "C":
                code.append("K")
        elif c == "P":
            code.append("F" if at(i + 1) == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if at(i + 1) == "H" or txt[i + 1 : i + 3] in ("IO", "IA"):
                code.append("X")
            else:
                code.append("S")
        elif c == "T":
            if txt[i + 1 : i + 3] in ("IO", "IA"):
                code.append("X")
            elif at(i + 1) == "H":
                code.append("0")
            elif txt[i + 1 : i + 3] != "CH":
                code.append("T")
        elif c == "V":
            code.append("F")
        elif c in "WY":
            if is_vowel(i + 1):
                code.append(c)
        elif c == "X":
            code.append("K")
            if len(code) < max_len:
                code.append("S")
        elif c == "Z":
            code.append("S")
        i += 1
    return "".join(code)


def double_metaphone(s: str, max_len: int = 4) -> tuple[str, str]:
    """Double Metaphone (Lawrence Philips, C/C++ Users Journal 6/2000;
    the public-domain reference rule set) — primary and alternate
    encodings, default length 4 as in DoubleMetaphoneFilterFactory
    (DEFAULT_MAX_CODE_LENGTH, DoubleMetaphoneFilterFactory.java:45).
    Pinned by the reference's DoubleMetaphoneFilterTest vectors."""
    w = s.upper().strip()
    n = len(w)
    if n == 0 or not any("A" <= c <= "Z" for c in w):
        return "", ""
    last = n - 1

    def at(i: int) -> str:
        return w[i] if 0 <= i < n else ""

    def vowel(i: int) -> bool:
        ch = at(i)
        return ch != "" and ch in "AEIOUY"

    def at_in(i: int, chars: str) -> bool:
        ch = at(i)
        return ch != "" and ch in chars

    def sa(start: int, *pats: str) -> bool:
        """string-at: does any pattern start at ``start``?"""
        if start < 0:
            return False
        return any(w.startswith(p, start) for p in pats)

    slavo = (
        "W" in w or "K" in w or "CZ" in w or "WITZ" in w
    )
    pri: list[str] = []
    alt: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        alt.append(p if a is None else a)

    i = 0
    if sa(0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    elif at(0) == "X":
        add("S")
        i = 1

    while (len("".join(pri)) < max_len or len("".join(alt)) < max_len) and i < n:
        c = at(i)
        if c in "AEIOUY":
            if i == 0:
                add("A")
            i += 1
        elif c == "B":
            add("P")
            i += 2 if at(i + 1) == "B" else 1
        elif c == "\xc7":
            add("S")
            i += 1
        elif c == "C":
            if (
                i > 1
                and not vowel(i - 2)
                and sa(i - 1, "ACH")
                and at(i + 2) != "I"
                and (at(i + 2) != "E" or sa(i - 2, "BACHER", "MACHER"))
            ):
                add("K")
                i += 2
            elif i == 0 and sa(0, "CAESAR"):
                add("S")
                i += 2
            elif sa(i, "CHIA"):
                add("K")
                i += 2
            elif sa(i, "CH"):
                if i > 0 and sa(i, "CHAE"):
                    add("K", "X")
                elif (
                    i == 0
                    and (
                        sa(1, "HARAC", "HARIS")
                        or sa(1, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not sa(0, "CHORE")
                ):
                    add("K")
                elif (
                    sa(0, "VAN ", "VON ")
                    or sa(0, "SCH")
                    or sa(i - 2, "ORCHES", "ARCHIT", "ORCHID")
                    or sa(i + 2, "T", "S")
                    or (
                        (sa(i - 1, "A", "O", "U", "E") or i == 0)
                        and (
                            sa(i + 2, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
                            or i + 2 > last
                        )
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if sa(0, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
            elif sa(i, "CZ") and not sa(i - 2, "WICZ"):
                add("S", "X")
                i += 2
            elif sa(i + 1, "CIA"):
                add("X")
                i += 3
            elif sa(i, "CC") and not (i == 1 and at(0) == "M"):
                if sa(i + 2, "I", "E", "H") and not sa(i + 2, "HU"):
                    if (i == 1 and at(i - 1) == "A") or sa(
                        i - 1, "UCCEE", "UCCES"
                    ):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                else:
                    add("K")
                    i += 2
            elif sa(i, "CK", "CG", "CQ"):
                add("K")
                i += 2
            elif sa(i, "CI", "CE", "CY"):
                if sa(i, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if sa(i + 1, " C", " Q", " G"):
                    i += 3
                elif sa(i + 1, "C", "K", "Q") and not sa(i + 1, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if sa(i, "DG"):
                if sa(i + 2, "I", "E", "Y"):
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
            elif sa(i, "DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if at(i + 1) == "F" else 1
        elif c == "G":
            if at(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    add("K")
                    i += 2
                elif i == 0:
                    if at(i + 2) == "I":
                        add("J")
                    else:
                        add("K")
                    i += 2
                elif (
                    (i > 1 and sa(i - 2, "B", "H", "D"))
                    or (i > 2 and sa(i - 3, "B", "H", "D"))
                    or (i > 3 and sa(i - 4, "B", "H"))
                ):
                    i += 2  # silent GH (hugh, exhaust...)
                else:
                    if i > 2 and at(i - 1) == "U" and sa(
                        i - 3, "C", "G", "L", "R", "T"
                    ):
                        add("F")  # laugher, cough...
                    elif i > 0 and at(i - 1) != "I":
                        add("K")
                    i += 2
            elif at(i + 1) == "N":
                if i == 1 and vowel(0) and not slavo:
                    add("KN", "N")
                elif not sa(i + 2, "EY") and at(i + 1) != "Y" and not slavo:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
            elif sa(i + 1, "LI") and not slavo:
                add("KL", "L")
                i += 2
            elif i == 0 and (
                at(i + 1) == "Y"
                or sa(
                    i + 1,
                    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN",
                    "IE", "EI", "ER",
                )
            ):
                add("K", "J")
                i += 2
            elif (
                (sa(i + 1, "ER") or at(i + 1) == "Y")
                and not sa(0, "DANGER", "RANGER", "MANGER")
                and not sa(i - 1, "E", "I")
                and not sa(i - 1, "RGY", "OGY")
            ):
                add("K", "J")
                i += 2
            elif sa(i + 1, "E", "I", "Y") or sa(i - 1, "AGGI", "OGGI"):
                if sa(0, "VAN ", "VON ") or sa(0, "SCH") or sa(i + 1, "ET"):
                    add("K")
                elif sa(i + 1, "IER") and i + 3 == last:
                    add("J")
                else:
                    add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if at(i + 1) == "G" else 1
        elif c == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if sa(i, "JOSE") or sa(0, "SAN "):
                if (i == 0 and at(i + 4) == " ") or sa(0, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
            else:
                if i == 0 and not sa(i, "JOSE"):
                    add("J", "A")
                elif vowel(i - 1) and not slavo and at_in(i + 1, "AO"):
                    add("J", "H")
                elif i == last:
                    add("J", "")
                elif not sa(
                    i + 1,
                    "L", "T", "K", "S", "N", "M", "B", "Z",
                ) and not sa(i - 1, "S", "K", "L"):
                    add("J")
                i += 2 if at(i + 1) == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if at(i + 1) == "K" else 1
        elif c == "L":
            if at(i + 1) == "L":
                if (
                    i == n - 3
                    and sa(i - 1, "ILLO", "ILLA", "ALLE")
                ) or (
                    (sa(last - 1, "AS", "OS") or sa(last, "A", "O"))
                    and sa(i - 1, "ALLE")
                ):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
        elif c == "M":
            if (
                sa(i - 1, "UMB")
                and (i + 1 == last or sa(i + 2, "ER"))
            ) or at(i + 1) == "M":
                i += 2
            else:
                i += 1
            add("M")
        elif c == "N":
            add("N")
            i += 2 if at(i + 1) == "N" else 1
        elif c == "\xd1":
            add("N")
            i += 1
        elif c == "P":
            if at(i + 1) == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if at_in(i + 1, "PB") else 1
        elif c == "Q":
            add("K")
            i += 2 if at(i + 1) == "Q" else 1
        elif c == "R":
            if (
                i == last
                and not slavo
                and sa(i - 2, "IE")
                and not sa(i - 4, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if at(i + 1) == "R" else 1
        elif c == "S":
            if sa(i - 1, "ISL", "YSL"):
                i += 1  # silent: island, isle
            elif i == 0 and sa(i, "SUGAR"):
                add("X", "S")
                i += 1
            elif sa(i, "SH"):
                if sa(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
            elif sa(i, "SIO", "SIA") or sa(i, "SIAN"):
                if slavo:
                    add("S")
                else:
                    add("S", "X")
                i += 3
            elif (
                i == 0 and sa(i + 1, "M", "N", "L", "W")
            ) or sa(i + 1, "Z"):
                add("S", "X")
                i += 2 if sa(i + 1, "Z") else 1
            elif sa(i, "SC"):
                if at(i + 2) == "H":
                    if sa(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if sa(i + 3, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not vowel(3) and at(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                elif sa(i + 2, "I", "E", "Y"):
                    add("S")
                else:
                    add("SK")
                i += 3
            else:
                if i == last and sa(i - 2, "AI", "OI"):
                    add("", "S")  # french: louis, etc
                else:
                    add("S")
                i += 2 if sa(i + 1, "S", "Z") else 1
        elif c == "T":
            if sa(i, "TION") or sa(i, "TIA", "TCH"):
                add("X")
                i += 3
            elif sa(i, "TH") or sa(i, "TTH"):
                if sa(i + 2, "OM", "AM") or sa(0, "VAN ", "VON ") or sa(0, "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if sa(i + 1, "T", "D") else 1
        elif c == "V":
            add("F")
            i += 2 if at(i + 1) == "V" else 1
        elif c == "W":
            if sa(i, "WR"):
                add("R")
                i += 2
            else:
                if i == 0 and (vowel(i + 1) or sa(i, "WH")):
                    if vowel(i + 1):
                        add("A", "F")
                    else:
                        add("A")
                if (
                    (i == last and vowel(i - 1))
                    or sa(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or sa(0, "SCH")
                ):
                    add("", "F")
                    i += 1
                elif sa(i, "WICZ", "WITZ"):
                    add("TS", "FX")
                    i += 4
                else:
                    i += 1
        elif c == "X":
            if not (
                i == last
                and (sa(i - 3, "IAU", "EAU") or sa(i - 2, "AU", "OU"))
            ):
                add("KS")
            i += 2 if sa(i + 1, "C", "X") else 1
        elif c == "Z":
            if at(i + 1) == "H":
                add("J")
                i += 2
            else:
                if sa(i + 1, "ZO", "ZI", "ZA") or (
                    slavo and i > 0 and at(i - 1) != "T"
                ):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if at(i + 1) == "Z" else 1
        else:
            i += 1

    return "".join(pri)[:max_len], "".join(alt)[:max_len]


_ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "caverphone": caverphone2,
    "metaphone": metaphone,
    "double_metaphone_primary": lambda s: double_metaphone(s)[0],
}


def make_double_metaphone_filter(
    max_code_len: int = 4, inject: bool = True
):
    """DoubleMetaphoneFilter.java:50-107 — per token emit the PRIMARY
    encoding and, when it differs, the ALTERNATE, all at the token's
    position. inject=true keeps the original first; inject=false
    replaces it, except that a token with no encoding (or whose
    encoding equals itself) passes through unencoded — the reference's
    '12345' pass-through behavior pinned by DoubleMetaphoneFilterTest.
    Returns (terms, positions) -> (terms, positions)."""

    def run(
        terms: list[str], positions: list[int]
    ) -> tuple[list[str], list[int]]:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            primary, alternate = double_metaphone(t, max_code_len)
            emitted = False
            if inject:
                out_t.append(t)
                out_p.append(p)
                emitted = True
            if primary and primary != t:
                out_t.append(primary)
                out_p.append(p)
                emitted = True
                if alternate and alternate != primary:
                    out_t.append(alternate)
                    out_p.append(p)
            if not emitted:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p

    return run


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
