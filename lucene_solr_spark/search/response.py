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
    body = _body(result, params, fl, num_found, start, qtime_ms)
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


# ---------------------------------------------------------------------------
# eval-able writers: wt=python / ruby / php / phps
#
# Reference: solr/core/src/java/org/apache/solr/response/
# {PythonResponseWriter,RubyResponseWriter,PHPResponseWriter,
# PHPSerializedResponseWriter}.java. All four serialize the SAME
# NamedList tree as wt=json (NamedLists map-mangled), differing only in
# literal syntax: Python dict/list source, Ruby hash (=> keys, nil),
# PHP array(...) source, and PHP serialize() wire bytes.
# ---------------------------------------------------------------------------


def _body(
    result: dict,
    params: dict[str, Any] | None,
    fl: list[str] | None,
    num_found: int | None,
    start: int,
    qtime_ms: int,
) -> dict[str, Any]:
    """The NamedList tree every non-XML writer serializes (as dicts,
    i.e. writeNamedListAsMapMangled)."""
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
    return body


def _py_str(s: str) -> str:
    """PythonWriter.writeStr: escape \\ ' \\r \\n \\t; chars outside
    visible ASCII become \\uXXXX with a u'' prefix."""
    out = []
    need_unicode = False
    for ch in s:
        if ch in ("'", "\\"):
            out.append("\\" + ch)
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch < " " or ord(ch) > 127:
            cp = ord(ch)
            if cp > 0xFFFF:  # surrogate pair, as Java chars would
                cp -= 0x10000
                out.append("\\u%04x" % (0xD800 + (cp >> 10)))
                out.append("\\u%04x" % (0xDC00 + (cp & 0x3FF)))
            else:
                out.append("\\u%04x" % cp)
            need_unicode = True
        else:
            out.append(ch)
    return ("u'" if need_unicode else "'") + "".join(out) + "'"


def _sq_str(s: str) -> str:
    """Ruby/PHP single-quoted string: only \\ and ' are escaped
    (RubyWriter.writeStr / PHPWriter.writeStr); raw UTF-8 passes."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _py_val(v: Any) -> str:
    import math

    if v is None:
        return "None"
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, float):
        if math.isnan(v):
            return "float('NaN')"
        if math.isinf(v):
            return "float('Inf')" if v > 0 else "-float('Inf')"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_py_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{_py_str(str(k))}:{_py_val(x)}" for k, x in v.items()
            )
            + "}"
        )
    return _py_str(str(v))


def write_python(result: dict, **kw: Any) -> str:
    """PythonResponseWriter (wt=python): an eval()-able dict literal.
    NaN/Inf follow NaNFloatWriter: float('NaN') / float('Inf')."""
    return _py_val(_body(result, kw.get("params"), kw.get("fl"),
                         kw.get("num_found"), kw.get("start", 0),
                         kw.get("qtime_ms", 0)))


def _rb_val(v: Any) -> str:
    import math

    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "(0.0/0.0)"
        if math.isinf(v):
            return "(1.0/0.0)" if v > 0 else "-(1.0/0.0)"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_rb_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{_sq_str(str(k))}=>{_rb_val(x)}" for k, x in v.items()
            )
            + "}"
        )
    return _sq_str(str(v))


def write_ruby(result: dict, **kw: Any) -> str:
    """RubyResponseWriter (wt=ruby): an eval-able Ruby hash; nil for
    null, 'k'=>v keys, NaN/Inf as (0.0/0.0) / (1.0/0.0)."""
    return _rb_val(_body(result, kw.get("params"), kw.get("fl"),
                         kw.get("num_found"), kw.get("start", 0),
                         kw.get("qtime_ms", 0)))


def _php_val(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v) if isinstance(v, float) else str(v)
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(_php_val(x) for x in v) + ")"
    if isinstance(v, dict):
        return (
            "array("
            + ",".join(
                f"{_sq_str(str(k))}=>{_php_val(x)}" for k, x in v.items()
            )
            + ")"
        )
    return _sq_str(str(v))


def write_php(result: dict, **kw: Any) -> str:
    """PHPResponseWriter (wt=php): eval-able array(...) source."""
    return _php_val(_body(result, kw.get("params"), kw.get("fl"),
                          kw.get("num_found"), kw.get("start", 0),
                          kw.get("qtime_ms", 0)))


def _phps_val(v: Any) -> str:
    """PHP serialize() wire format (PHPSerializedWriter): string
    lengths are UTF-8 BYTE counts, docs arrays use integer keys."""
    if v is None:
        return "N;"
    if isinstance(v, bool):
        return "b:1;" if v else "b:0;"
    if isinstance(v, int):
        return f"i:{v};"
    if isinstance(v, float):
        return f"d:{repr(v)};"
    if isinstance(v, (list, tuple)):
        inner = "".join(
            f"i:{i};{_phps_val(x)}" for i, x in enumerate(v)
        )
        return f"a:{len(v)}:{{{inner}}}"
    if isinstance(v, dict):
        inner = "".join(
            _phps_val(str(k)) + _phps_val(x) for k, x in v.items()
        )
        return f"a:{len(v)}:{{{inner}}}"
    s = str(v)
    return f's:{len(s.encode("utf-8"))}:"{s}";'


def write_phps(result: dict, **kw: Any) -> str:
    """PHPSerializedResponseWriter (wt=phps): unserialize()-ready
    bytes; byte-counted strings, integer-keyed doc arrays."""
    return _phps_val(_body(result, kw.get("params"), kw.get("fl"),
                           kw.get("num_found"), kw.get("start", 0),
                           kw.get("qtime_ms", 0)))
