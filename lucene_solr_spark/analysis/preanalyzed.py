"""PreAnalyzedField — ingest externally-analyzed token streams.

Reference: solr/core/src/java/org/apache/solr/schema/
PreAnalyzedField.java + JsonPreAnalyzedParser.java:52-220 — a field
whose value arrives ALREADY tokenized (an upstream NLP pipeline did the
analysis), serialized as

    {"v": "1", "str": "<stored text>",
     "tokens": [{"t": "term", "i": posIncr, "s": start, "e": end}, ...]}

``i`` defaults to 1 (JsonPreAnalyzedParser posIncr handling); positions
accumulate Lucene-style (position = -1, then += i per token, so the
first default-increment token sits at 0 and i=2 leaves a stop-style
gap). ``str`` is the stored value; offsets/payload/type keys are
accepted and ignored by this engine (no offset store).

The parser plugs into the engine's analyzer slot, so
``invert_batch(..., analyzer=preanalyzed_analyzer())`` indexes a column
of pre-analyzed JSON exactly like a text column — the training-pipeline
pattern where tokenization happened in an earlier job and must not be
redone (or must come from a different tokenizer than the engine's).
"""

from __future__ import annotations

import json

VERSION = "1"


def parse_preanalyzed(value: str) -> tuple[list[str], list[int], str | None]:
    """JSON pre-analyzed value -> (terms, positions, stored_str).
    Raises ValueError on a missing/unknown version or malformed tokens
    (JsonPreAnalyzedParser.parse error cases)."""
    if not value or not value.strip():
        return [], [], None
    try:
        obj = json.loads(value)
    except json.JSONDecodeError as e:
        raise ValueError(f"invalid pre-analyzed JSON: {e}") from None
    if not isinstance(obj, dict):
        raise ValueError("pre-analyzed value must be a JSON object")
    v = obj.get("v")
    if v is None:
        raise ValueError("Missing VERSION key")
    if str(v) != VERSION:
        raise ValueError(f"Unknown VERSION '{v}', expected {VERSION}")
    terms: list[str] = []
    positions: list[int] = []
    pos = -1
    for tok in obj.get("tokens") or []:
        if not isinstance(tok, dict) or "t" not in tok:
            raise ValueError(f"malformed token entry: {tok!r}")
        incr = int(tok.get("i", 1))
        pos += incr
        terms.append(str(tok["t"]))
        positions.append(pos)
    return terms, positions, obj.get("str")


def to_preanalyzed_json(
    terms: list[str],
    positions: list[int],
    stored: str | None = None,
) -> str:
    """Serialize (terms, positions) back to the JSON wire form
    (JsonPreAnalyzedParser.toFormattedString direction): position
    deltas become ``i`` increments."""
    toks = []
    prev = -1
    for t, p in zip(terms, positions):
        toks.append({"t": t, "i": int(p) - prev})
        prev = int(p)
    obj: dict = {"v": VERSION, "tokens": toks}
    if stored is not None:
        obj["str"] = stored
    return json.dumps(obj)


def preanalyzed_analyzer():
    """Analyzer-slot adapter: text -> (terms, positions), where 'text'
    is the pre-analyzed JSON."""

    def run(value: str) -> tuple[list[str], list[int]]:
        terms, positions, _ = parse_preanalyzed(value)
        return terms, positions

    return run
