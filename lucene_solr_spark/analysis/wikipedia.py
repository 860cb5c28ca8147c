"""WikipediaTokenizer — typed tokens from Mediawiki markup.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
wikipedia/WikipediaTokenizerImpl.jflex (the state grammar this scanner
re-implements from scratch) and WikipediaTokenizer.java:41-100 (type
constants, TOKENS_ONLY / UNTOKENIZED_ONLY / BOTH output modes, the
untokenized-run collapse).  Behavior is pinned by the reference's own
WikipediaTokenizerTest vectors (see tests/test_wikipedia.py).

State machine (jflex states -> here):
  YYINITIAL           plain text: ALPHANUM / APOSTROPHE / ACRONYM /
                      COMPANY / HOST / NUM rules; markup openers
  INTERNAL_LINK       ``[[...]]`` -> il tokens
  CATEGORY            ``[[:?Category:...]]`` -> c tokens
  EXTERNAL_LINK       ``[url label]`` -> elu (the URL) + el (label,
                      first label token shares the URL's position)
  TWO/THREE/FIVE_QUOTES + STRING  ``''``/``'''``/``'''''`` -> i/b/bi
  DOUBLE_EQUALS (+STRING)         ``==h==`` -> h, ``===sh===`` -> sh
  DOUBLE_BRACE        ``{{...}}`` / ``<ref>...</ref>`` -> ci
``<tag attr="v">`` markup is skipped (TAGS rule); an unmatched ``''``
closer is swallowed by the numBalanced counter
(WikipediaTokenizerImpl.jflex:204, the LUCENE-1133 fix).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# WikipediaTokenizer.java:41-51
INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"
ALPHANUM = "<ALPHANUM>"
APOSTROPHE = "<APOSTROPHE>"
ACRONYM = "<ACRONYM>"
COMPANY = "<COMPANY>"
HOST = "<HOST>"
NUM = "<NUM>"

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

_WORD = r"[A-Za-z0-9À-ÿ]+"
_ALPHA = r"[A-Za-zÀ-ÿ]+"
_P = r"[_\-/.,]"
_HD = r"[A-Za-z0-9]*[0-9][A-Za-z0-9]*"

# YYINITIAL token rules, longest-match with this priority order
# (WikipediaTokenizerImpl.jflex:193-200): APOSTROPHE/ACRONYM/COMPANY
# before NUM/HOST before bare ALPHANUM.
_PLAIN_RULES = [
    (re.compile(rf"{_ALPHA}(?:'{_ALPHA})+"), APOSTROPHE),
    (re.compile(rf"{_ALPHA}\.(?:{_ALPHA}\.)+"), ACRONYM),
    (re.compile(rf"{_ALPHA}[&@]{_ALPHA}"), COMPANY),
    # NUM: adjacent alnum segments joined by punctuation where every
    # other segment has a digit (jflex NUM production, simplified to
    # the digit-punct-digit and alnum-punct-hasdigit forms)
    (re.compile(rf"(?:{_HD}(?:{_P}{_WORD})+|{_WORD}(?:{_P}{_HD})+)"),
     NUM),
    (re.compile(rf"{_WORD}(?:\.{_WORD})+"), HOST),
    (re.compile(_WORD), ALPHANUM),
]
_WORD_RE = re.compile(_WORD)
_URL_RE = re.compile(
    rf"(?:https?|ftp)://{_WORD}(?:\.{_WORD})+"
    rf"(?:/?(?:{_WORD}|{_P}|[?&=#~%+])*)*"
)
_TAG_RE = re.compile(rf'</?{_WORD}(?:\s*{_WORD}="[^"]*")*\s*/?>')
_CAT_RE = re.compile(r"\[\[:?Category:")


@dataclass
class WikiToken:
    term: str
    type: str
    pos_inc: int
    start: int
    end: int
    flags: int = 0


def _scan(text: str) -> list[tuple]:
    """Raw scan: list of (term, type, pos_inc, start, end, run_id).
    run_id groups back-to-back wiki tokens of one markup block (the
    numWikiTokensSeen reset points) for the untokenized collapse."""
    out = []
    i, n = 0, len(text)
    run = 0
    num_balanced = 0

    while i < n:
        ch = text[i]
        if ch == "[":
            m = _CAT_RE.match(text, i)
            if m:  # CATEGORY_STATE
                run += 1
                i = m.end()
                close = text.find("]]", i)
                stop = close if close != -1 else n
                for wm in _WORD_RE.finditer(text, i, stop):
                    out.append(
                        (wm.group(), CATEGORY, 1, wm.start(), wm.end(),
                         run)
                    )
                i = stop + 2 if close != -1 else n
                continue
            if text.startswith("[[", i):  # INTERNAL_LINK_STATE
                run += 1
                i += 2
                close = text.find("]]", i)
                stop = close if close != -1 else n
                for wm in _WORD_RE.finditer(text, i, stop):
                    out.append(
                        (wm.group(), INTERNAL_LINK, 1, wm.start(),
                         wm.end(), run)
                    )
                i = stop + 2 if close != -1 else n
                continue
            # EXTERNAL_LINK_STATE (bare '[')
            run += 1
            i += 1
            close = text.find("]", i)
            stop = close if close != -1 else n
            num_link_toks = 0
            j = i
            while j < stop:
                um = _URL_RE.match(text, j)
                if um:
                    out.append(
                        (um.group(), EXTERNAL_LINK_URL, 1, um.start(),
                         um.end(), run)
                    )
                    j = um.end()
                    continue
                wm = _WORD_RE.match(text, j)
                if wm:
                    inc = 0 if num_link_toks == 0 else 1
                    out.append(
                        (wm.group(), EXTERNAL_LINK, inc, wm.start(),
                         wm.end(), run)
                    )
                    num_link_toks += 1
                    j = wm.end()
                    continue
                j += 1
            i = stop + 1 if close != -1 else n
            continue
        if ch == "'" and text.startswith("''", i):
            # quote-run dispatch (TWO/THREE/FIVE_SINGLE_QUOTES_STATE)
            qlen = 2
            while i + qlen < n and text[i + qlen] == "'" and qlen < 5:
                qlen += 1
            if num_balanced == 0:
                num_balanced = 1
                ttype = (
                    BOLD_ITALICS if qlen >= 5
                    else BOLD if qlen >= 3 else ITALICS
                )
                run += 1
                i += qlen
                # STRING state: currentTokType until a closing quote
                # run, a markup opener, or end of input
                emitted_any = False
                while i < n:
                    if text.startswith("''", i):
                        q2 = 2
                        while i + q2 < n and text[i + q2] == "'" \
                                and q2 < 5:
                            q2 += 1
                        i += q2
                        num_balanced = 0
                        break
                    if text[i] == "[":
                        # links override. From STRING (a word was
                        # emitted) the jflex rule clears numBalanced;
                        # from TWO/THREE/FIVE_SINGLE_QUOTES_STATE it
                        # does NOT — the eventual dangling '' closer
                        # is then swallowed by the numBalanced check
                        # (WikipediaTokenizerImpl.jflex:204 vs 262)
                        if emitted_any:
                            num_balanced = 0
                        break
                    tm = _TAG_RE.match(text, i)
                    if tm:
                        i = tm.end()
                        continue
                    wm = _WORD_RE.match(text, i)
                    if wm:
                        out.append(
                            (wm.group(), ttype, 1, wm.start(),
                             wm.end(), run)
                        )
                        emitted_any = True
                        i = wm.end()
                        continue
                    i += 1
                continue
            else:
                # dangling closer: swallow, reset (LUCENE-1133)
                num_balanced = 0
                i += qlen
                continue
        if ch == "=" and text.startswith("==", i):
            run += 1
            if text.startswith("===", i):  # SUB_HEADING via STRING
                i += 3
                close = text.find("===", i)
                stop = close if close != -1 else n
                for wm in _WORD_RE.finditer(text, i, stop):
                    out.append(
                        (wm.group(), SUB_HEADING, 1, wm.start(),
                         wm.end(), run)
                    )
                i = stop + 3 if close != -1 else n
                continue
            i += 2
            close = text.find("==", i)
            stop = close if close != -1 else n
            for wm in _WORD_RE.finditer(text, i, stop):
                out.append(
                    (wm.group(), HEADING, 1, wm.start(), wm.end(), run)
                )
            i = stop + 2 if close != -1 else n
            continue
        if text.startswith("{{", i) or text.startswith("<ref>", i):
            # DOUBLE_BRACE_STATE (citation)
            run += 1
            opener_brace = text.startswith("{{", i)
            i += 2 if opener_brace else 5
            ends = []
            for pat in ("}}", "</ref>"):
                k = text.find(pat, i)
                if k != -1:
                    ends.append((k, len(pat)))
            if ends:
                stop, skiplen = min(ends)
            else:
                stop, skiplen = n, 0
            for wm in _WORD_RE.finditer(text, i, stop):
                out.append(
                    (wm.group(), CITATION, 1, wm.start(), wm.end(),
                     run)
                )
            i = stop + skiplen
            continue
        tm = _TAG_RE.match(text, i)
        if tm:
            i = tm.end()
            continue
        if ch.isalnum():
            best = None
            for rx, ttype in _PLAIN_RULES:
                m = rx.match(text, i)
                if m and (best is None or m.end() > best[0].end()):
                    best = (m, ttype)
            if best is not None:
                m, ttype = best
                out.append(
                    (m.group(), ttype, 1, m.start(), m.end(), -1)
                )
                i = m.end()
                continue
        i += 1
    return out


def wikipedia_tokenize(
    text: str,
    token_output: int = TOKENS_ONLY,
    untokenized_types: frozenset = frozenset(),
) -> list[WikiToken]:
    raw = _scan(text)
    if token_output == TOKENS_ONLY or not untokenized_types:
        return [WikiToken(*t[:5]) for t in raw]
    out: list[WikiToken] = []
    i = 0
    while i < len(raw):
        term, ttype, inc, start, end, run = raw[i]
        if run == -1 or ttype not in untokenized_types:
            out.append(WikiToken(term, ttype, inc, start, end))
            i += 1
            continue
        j = i
        while (
            j + 1 < len(raw)
            and raw[j + 1][5] == run
            and raw[j + 1][1] == ttype
        ):
            j += 1
        comp_start, comp_end = raw[i][3], raw[j][4]
        out.append(
            WikiToken(
                text[comp_start:comp_end], ttype, 1, comp_start,
                comp_end, UNTOKENIZED_TOKEN_FLAG,
            )
        )
        if token_output == BOTH:
            for k in range(i, j + 1):
                t2, ty2, _, s2, e2, _ = raw[k]
                out.append(
                    WikiToken(t2, ty2, 0 if k == i else 1, s2, e2)
                )
        i = j + 1
    return out


def wikipedia_terms_positions(
    text: str,
    token_output: int = TOKENS_ONLY,
    untokenized_types: frozenset = frozenset(),
) -> tuple[list[str], list[int]]:
    """(terms, positions) view for the analyzer chain (positions from
    cumulative posIncrements, first token at 0)."""
    toks = wikipedia_tokenize(text, token_output, untokenized_types)
    terms, positions = [], []
    pos = -1
    for t in toks:
        pos += t.pos_inc
        if pos < 0:
            # a bare-[ link label is the reference's one posInc=0
            # stream opener (EXTERNAL_LINK_STATE ALPHANUM rule fires
            # with numLinkToks==0 even when no URL matched); clamp the
            # resulting -1 to a valid first position
            pos = 0
        terms.append(t.term)
        positions.append(pos)
    return terms, positions
