"""ASCII folding — the ASCIIFoldingFilter analyzer-slot extension.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/ASCIIFoldingFilter.java (folds Unicode Latin variants to
their ASCII base). This covers the Latin-1 Supplement + Latin Extended-A
block — the overwhelming bulk of real-world hits; the reference's full
table also spans exotic blocks (out of scope v1, same slot).

Like the stemmer, NOT in the default pinned chain; offered for the
configurable analyzer pipeline (SURVEY.md §2.2 'other filters').
"""

from __future__ import annotations

import unicodedata

_EXTRA = {
    "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "ß": "ss",
    "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H", "ı": "i",
    "ĸ": "k", "ŀ": "l", "Ŀ": "L", "ł": "l", "Ł": "L",
    "ŋ": "n", "Ŋ": "N", "œ": "oe", "Œ": "OE", "ŧ": "t",
    "Ŧ": "T", "þ": "th", "Þ": "TH", "ð": "d", "Ð": "D",
}


def fold_to_ascii(text: str) -> str:
    """Fold diacritics/ligatures to ASCII; non-Latin codepoints pass
    through unchanged (the reference leaves unfoldable chars alone)."""
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _EXTRA:
            out.append(_EXTRA[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        stripped = "".join(
            c for c in decomp if not unicodedata.combining(c)
        )
        out.append(stripped if stripped and ord(stripped[0]) < 128 else ch)
    return "".join(out)


def folding_filter(terms: list[str]) -> list[str]:
    """TokenFilter form (arity-preserving)."""
    return [fold_to_ascii(t) for t in terms]
