"""QueryResponseWriters — Solr's wt= serialization layer.

Reference: solr/core/src/java/org/apache/solr/response/
{JSONResponseWriter,XMLResponseWriter,CSVResponseWriter}.java. Solr
formats one request's response page at the edge; the analogue here
formats the collected top-k page of a ``handler.select`` result (the
page is bounded by rows=, so driver-side assembly is the honest shape —
bulk exports go through ``DataFrame.write`` instead, which these
writers deliberately do not reimplement).

Shapes match the reference wire formats:

  json  {"responseHeader": {"status": 0, "QTime": q, "params": {...}},
         "response": {"numFound": n, "start": s, "docs": [...]},
         "facet_counts": {"facet_fields": {f: [val, cnt, ...]}}}
        (facet arrays use Solr's flattened [value, count, ...] form,
         JSONResponseWriter NamedList flattening)

  xml   <response><lst name="responseHeader">...</lst>
        <result name="response" numFound=".." start=".."><doc>
        <str|int|long|float|double|bool name="f">v</..></doc></result>

  csv   CSVResponseWriter: header of field names, one line per doc,
        multi-values joined (csv.mv.separator), quoting on demand.
"""

from __future__ import annotations

import json as _json
from typing import Any
from xml.sax.saxutils import escape, quoteattr


def _doc_rows(result: dict, fl: list[str] | None) -> tuple[list[dict], list[str]]:
    rows = [r.asDict(recursive=True) for r in result["response"].collect()]
    if fl:
        rows = [{k: r.get(k) for k in fl} for r in rows]
        cols = list(fl)
    else:
        cols = list(rows[0].keys()) if rows else []
    return rows, cols


def _facet_lists(result: dict) -> dict[str, list]:
    """NamedList flattening: [value, count, value, count, ...]."""
    out: dict[str, list] = {}
    for field, df in (result.get("facets") or {}).items():
        flat: list = []
        for r in df.collect():
            vals = list(r)
            flat.extend([vals[0], int(vals[-1])])
        out[field] = flat
    return out


def write_json(
    result: dict,
    params: dict[str, Any] | None = None,
    fl: list[str] | None = None,
    num_found: int | None = None,
    start: int = 0,
    qtime_ms: int = 0,
    indent: bool = False,
) -> str:
    """JSONResponseWriter: the canonical Solr JSON response body."""
    docs, _ = _doc_rows(result, fl)
    body: dict[str, Any] = {
        "responseHeader": {
            "status": 0,
            "QTime": int(qtime_ms),
            "params": {k: str(v) for k, v in (params or {}).items()},
        },
        "response": {
            "numFound": int(
                num_found if num_found is not None else len(docs)
            ),
            "start": int(start),
            "docs": docs,
        },
    }
    facets = _facet_lists(result)
    if facets:
        body["facet_counts"] = {"facet_fields": facets}
    return _json.dumps(
        body, indent=2 if indent else None, default=str
    )


def _xml_val(name: str, v: Any) -> str:
    if isinstance(v, bool):
        tag = "bool"
        txt = "true" if v else "false"
    elif isinstance(v, int):
        tag = "long"
        txt = str(v)
    elif isinstance(v, float):
        tag = "double"
        txt = repr(v)
    else:
        tag = "str"
        txt = escape(str(v))
    return f'<{tag} name={quoteattr(str(name))}>{txt}</{tag}>'


def write_xml(
    result: dict,
    params: dict[str, Any] | None = None,
    fl: list[str] | None = None,
    num_found: int | None = None,
    start: int = 0,
    qtime_ms: int = 0,
) -> str:
    """XMLResponseWriter: the <response><result name="response">
    wire shape."""
    docs, cols = _doc_rows(result, fl)
    parts = ['<?xml version="1.0" encoding="UTF-8"?>', "<response>"]
    parts.append('<lst name="responseHeader">')
    parts.append(f'<int name="status">0</int>')
    parts.append(f'<int name="QTime">{int(qtime_ms)}</int>')
    if params:
        parts.append('<lst name="params">')
        for k, v in params.items():
            parts.append(
                f'<str name={quoteattr(str(k))}>{escape(str(v))}</str>'
            )
        parts.append("</lst>")
    parts.append("</lst>")
    nf = int(num_found if num_found is not None else len(docs))
    parts.append(
        f'<result name="response" numFound="{nf}" start="{int(start)}">'
    )
    for d in docs:
        parts.append("<doc>")
        for c in cols:
            if d.get(c) is not None:
                parts.append(_xml_val(c, d[c]))
        parts.append("</doc>")
    parts.append("</result>")
    parts.append("</response>")
    return "".join(parts)


def write_csv(
    result: dict,
    fl: list[str] | None = None,
    separator: str = ",",
    mv_separator: str = "|",
    null_value: str = "",
) -> str:
    """CSVResponseWriter: header + one line per doc; multi-valued
    (list) fields join on ``csv.mv.separator``; values containing the
    separator/quote/newline are double-quoted with quote doubling."""
    docs, cols = _doc_rows(result, fl)

    def cell(v: Any) -> str:
        if v is None:
            s = null_value
        elif isinstance(v, (list, tuple)):
            s = mv_separator.join(str(x) for x in v)
        else:
            s = str(v)
        if separator in s or '"' in s or "\n" in s:
            s = '"' + s.replace('"', '""') + '"'
        return s

    lines = [separator.join(cols)]
    for d in docs:
        lines.append(separator.join(cell(d.get(c)) for c in cols))
    return "\n".join(lines)
