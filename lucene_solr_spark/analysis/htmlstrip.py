"""HTML strip char filter — LegacyHTMLStripCharFilter analogue.

Reference: solr/core/src/java/org/apache/solr/analysis/
LegacyHTMLStripCharFilter.java (and lucene/analysis/common/.../
charfilter/HTMLStripCharFilter.java): a CharFilter that runs BEFORE
the tokenizer, removing markup and decoding character entities so the
token stream sees only text content.

Scope (documented approximation of the reference's state machine):
comments, <script>/<style> elements WITH their content, all remaining
tags, and the common named + numeric character entities. Markup is
replaced by a space — token boundaries survive where tags separated
words (the reference preserves offsets the same way).
"""

from __future__ import annotations

import re

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPT = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_STYLE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_TAG = re.compile(r"</?[a-zA-Z!][^>]*>")
_NUM_ENT = re.compile(r"&#(x?[0-9a-fA-F]+);")
_NAMED = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}
_NAMED_ENT = re.compile(r"&(" + "|".join(_NAMED) + r");")


def strip_html(text: str) -> str:
    """Strip markup, decode entities; tags become single spaces."""
    if not text:
        return text
    t = _COMMENT.sub(" ", text)
    t = _SCRIPT.sub(" ", t)
    t = _STYLE.sub(" ", t)
    t = _TAG.sub(" ", t)

    def num(m: re.Match) -> str:
        body = m.group(1)
        try:
            cp = int(body[1:], 16) if body[0] in "xX" else int(body)
            return chr(cp)
        except (ValueError, OverflowError):
            return m.group(0)

    t = _NUM_ENT.sub(num, t)
    t = _NAMED_ENT.sub(lambda m: _NAMED[m.group(1)], t)
    return t
