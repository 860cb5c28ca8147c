"""JavaBin codec — Solr's binary wire format (wt=javabin), the default
SolrJ transport.

Reference: solr/solrj/src/java/org/apache/solr/common/util/
JavaBinCodec.java:42-76 (tag table), 505-531 (small int), 513-532
(small long), 457-471 (string as tag + UTF-8 byte length),
625-650 (vint/vlong), writeExternString (per-stream string interning:
index 0 = literal follows, else 1-based back-reference), and
solr/core/src/java/org/apache/solr/response/BinaryResponseWriter.java
(the response tree: SimpleOrderedMap of responseHeader + SolrDocumentList).

Wire grammar (stream = version byte 0x02 then one value):

  tag byte upper 3 bits select the sized types (STR/SINT/SLONG/ARR/
  ORDERED_MAP/NAMED_LST/EXTERN_STRING); lower 5 bits carry the size,
  0x1f meaning "0x1f + vint extra". Upper bits clear = the fixed
  singleton tags (NULL..SOLRINPUTDOC).

Type mapping on the Python side:

  None          <-> NULL             bool  <-> BOOL_TRUE/FALSE
  str           <-> STR (utf-8)      bytes <-> BYTEARR
  int           --> SINT/INT if it fits Java int else SLONG/LONG
  JLong(int)    --> SLONG/SLONG+vlong/LONG   (Java Long, e.g. numFound)
  JFloat(float) --> FLOAT (float32)  float <-> DOUBLE
  datetime      <-> DATE (epoch millis, fixed 8-byte big-endian)
  NamedList     <-> ORDERED_MAP (SimpleOrderedMap) — ordered (name, val)
                    pairs, names interned as extern strings
  dict          <-> MAP — string keys interned, others written as values
  list/tuple    <-> ARR
  SolrDocument      <-> SOLRDOC + ORDERED_MAP of fields
  SolrDocumentList  <-> SOLRDOCLST ([numFound, start, maxScore] + docs)
  SolrInputDocument <-> SOLRINPUTDOC (docBoost, per-field optional boost)

readSmallInt/Long reassemble (vint << 4) | low-nibble exactly as the
reference; writeInt only takes the small path for val > 0 (zero and
negatives go fixed-width INT), writeLong for (val & 0xff<<56) == 0 —
bit-for-bit the reference's conditions, so goldens pin the same bytes
SolrJ would emit.
"""

from __future__ import annotations

import datetime as _dt
import struct
from io import BytesIO
from typing import Any, Iterable

NULL = 0
BOOL_TRUE = 1
BOOL_FALSE = 2
BYTE = 3
SHORT = 4
DOUBLE = 5
INT = 6
LONG = 7
FLOAT = 8
DATE = 9
MAP = 10
SOLRDOC = 11
SOLRDOCLST = 12
BYTEARR = 13
ITERATOR = 14
END = 15
SOLRINPUTDOC = 16

STR = 1 << 5
SINT = 2 << 5
SLONG = 3 << 5
ARR = 4 << 5
ORDERED_MAP = 5 << 5
NAMED_LST = 6 << 5
EXTERN_STRING = 7 << 5

VERSION = 2

_JAVA_INT_MIN, _JAVA_INT_MAX = -(1 << 31), (1 << 31) - 1


class JLong(int):
    """Force the Java Long wire path (SLONG/LONG) for an int."""


class JFloat(float):
    """Force the Java Float wire path (FLOAT, float32)."""


class JByte(int):
    """Java byte (fixed 1-byte signed)."""


class JShort(int):
    """Java short (fixed 2-byte signed big-endian)."""


class NamedList(list):
    """SimpleOrderedMap: ordered (name, value) pairs, repeats allowed."""

    def add(self, name: str | None, val: Any) -> "NamedList":
        self.append((name, val))
        return self

    def as_dict(self) -> dict:
        return {k: v for k, v in self}

    def get(self, name: str, default: Any = None) -> Any:
        for k, v in self:
            if k == name:
                return v
        return default


class SolrDocument(dict):
    """Field name -> value map written as SOLRDOC."""


class SolrDocumentList(list):
    def __init__(
        self,
        docs: Iterable[dict] = (),
        num_found: int = 0,
        start: int = 0,
        max_score: float | None = None,
    ):
        super().__init__(docs)
        self.num_found = int(num_found)
        self.start = int(start)
        self.max_score = max_score

    def __eq__(self, other):  # value equality incl. header for tests
        return (
            isinstance(other, SolrDocumentList)
            and list(self) == list(other)
            and (self.num_found, self.start, self.max_score)
            == (other.num_found, other.start, other.max_score)
        )

    __hash__ = None


class SolrInputDocument(dict):
    """Update-side document: field -> value, optional per-field boost
    (``boosts`` dict) and document boost."""

    def __init__(self, *a, doc_boost: float = 1.0, boosts: dict | None = None, **kw):
        super().__init__(*a, **kw)
        self.doc_boost = float(doc_boost)
        self.boosts = dict(boosts or {})


_END_OBJ = object()


class _Encoder:
    def __init__(self) -> None:
        self.out = BytesIO()
        self._interned: dict[str, int] = {}

    # -- low level --------------------------------------------------------
    def _byte(self, b: int) -> None:
        self.out.write(bytes((b & 0xFF,)))

    def _vint(self, i: int) -> None:
        # JavaBinCodec.writeVInt:625-631 (unsigned 7-bit groups, LSB first)
        i &= 0xFFFFFFFF
        while i & ~0x7F:
            self._byte((i & 0x7F) | 0x80)
            i >>= 7
        self._byte(i)

    def _vlong(self, i: int) -> None:
        i &= 0xFFFFFFFFFFFFFFFF
        while i & ~0x7F:
            self._byte((i & 0x7F) | 0x80)
            i >>= 7
        self._byte(i)

    def _tag(self, tag: int, size: int | None = None) -> None:
        # writeTag(byte,int): sized tags pack size<0x1f into the tag byte
        if size is None:
            self._byte(tag)
            return
        if tag & 0xE0:
            if size < 0x1F:
                self._byte(tag | size)
            else:
                self._byte(tag | 0x1F)
                self._vint(size - 0x1F)
        else:
            self._byte(tag)
            self._vint(size)

    # -- typed writers ------------------------------------------------------
    def write_str(self, s: str) -> None:
        if s is None:
            self._tag(NULL)
            return
        # ByteUtils.UTF16toUTF8 == standard UTF-8 for well-formed text;
        # surrogatepass mirrors Java's tolerance of unpaired surrogates.
        b = s.encode("utf-8", "surrogatepass")
        self._tag(STR, len(b))
        self.out.write(b)

    def write_extern_str(self, s: str | None) -> None:
        if s is None:
            self._tag(NULL)
            return
        idx = self._interned.get(s, 0)
        self._tag(EXTERN_STRING, idx)
        if idx == 0:
            self.write_str(s)
            self._interned[s] = len(self._interned) + 1

    def write_int(self, v: int) -> None:
        # writeInt: only val > 0 takes the small path (JavaBinCodec:486-503)
        if v > 0:
            b = SINT | (v & 0x0F)
            if v >= 0x0F:
                self._byte(b | 0x10)
                self._vint(v >> 4)
            else:
                self._byte(b)
        else:
            self._byte(INT)
            self.out.write(struct.pack(">i", v))

    def write_long(self, v: int) -> None:
        if (v & (0xFF << 56)) == 0 and v >= 0:
            b = SLONG | (v & 0x0F)
            if v >= 0x0F:
                self._byte(b | 0x10)
                self._vlong(v >> 4)
            else:
                self._byte(b)
        else:
            self._byte(LONG)
            self.out.write(struct.pack(">q", v))

    def write_val(self, v: Any) -> None:
        if v is None:
            self._tag(NULL)
        elif v is _END_OBJ:
            self._tag(END)
        elif isinstance(v, bool):
            self._tag(BOOL_TRUE if v else BOOL_FALSE)
        elif isinstance(v, str):
            self.write_str(v)
        elif isinstance(v, JByte):
            self._byte(BYTE)
            self.out.write(struct.pack(">b", int(v)))
        elif isinstance(v, JShort):
            self._byte(SHORT)
            self.out.write(struct.pack(">h", int(v)))
        elif isinstance(v, JLong):
            self.write_long(int(v))
        elif isinstance(v, int):
            if _JAVA_INT_MIN <= v <= _JAVA_INT_MAX:
                self.write_int(v)
            else:
                self.write_long(v)
        elif isinstance(v, JFloat):
            self._byte(FLOAT)
            self.out.write(struct.pack(">f", float(v)))
        elif isinstance(v, float):
            self._byte(DOUBLE)
            self.out.write(struct.pack(">d", v))
        elif isinstance(v, _dt.datetime):
            self._byte(DATE)
            epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            millis = int((v - epoch).total_seconds() * 1000)
            self.out.write(struct.pack(">q", millis))
        elif isinstance(v, (bytes, bytearray)):
            self._tag(BYTEARR, len(v))
            self.out.write(bytes(v))
        elif isinstance(v, NamedList):
            self._tag(ORDERED_MAP, len(v))
            for name, val in v:
                self.write_extern_str(name)
                self.write_val(val)
        elif isinstance(v, SolrDocumentList):
            self._tag(SOLRDOCLST)
            self.write_val(
                [
                    JLong(v.num_found),
                    JLong(v.start),
                    JFloat(v.max_score) if v.max_score is not None else None,
                ]
            )
            self.write_val(list(v))
        elif isinstance(v, SolrInputDocument):
            self._tag(SOLRINPUTDOC, len(v))
            self._byte(FLOAT)
            self.out.write(struct.pack(">f", v.doc_boost))
            for name, val in v.items():
                boost = v.boosts.get(name, 1.0)
                if boost != 1.0:
                    self._byte(FLOAT)
                    self.out.write(struct.pack(">f", boost))
                self.write_extern_str(name)
                self.write_val(val)
        elif isinstance(v, SolrDocument):
            self._tag(SOLRDOC)
            self._tag(ORDERED_MAP, len(v))
            for name, val in v.items():
                self.write_extern_str(name)
                self.write_val(val)
        elif isinstance(v, dict):
            self._tag(MAP, len(v))
            for key, val in v.items():
                if isinstance(key, str):
                    self.write_extern_str(key)
                else:
                    self.write_val(key)
                self.write_val(val)
        elif isinstance(v, (list, tuple)):
            self._tag(ARR, len(v))
            for item in v:
                self.write_val(item)
        else:
            # writeVal fallback: class name + ':' + toString
            self.write_str(f"{type(v).__name__}:{v}")


def marshal(val: Any) -> bytes:
    enc = _Encoder()
    enc._byte(VERSION)
    enc.write_val(val)
    return enc.out.getvalue()


class _Decoder:
    def __init__(self, data: bytes) -> None:
        self.buf = memoryview(data)
        self.pos = 0
        self._strings: list[str] = []
        self.tag = 0

    def _byte(self) -> int:
        if self.pos >= len(self.buf):
            raise EOFError("truncated javabin stream")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def _read(self, n: int) -> bytes:
        b = bytes(self.buf[self.pos : self.pos + n])
        if len(b) != n:
            raise EOFError("truncated javabin stream")
        self.pos += n
        return b

    def _vint(self) -> int:
        b = self._byte()
        i = b & 0x7F
        shift = 7
        while b & 0x80:
            b = self._byte()
            i |= (b & 0x7F) << shift
            shift += 7
        return i

    def _size(self) -> int:
        sz = self.tag & 0x1F
        if sz == 0x1F:
            sz += self._vint()
        return sz

    def read_val(self) -> Any:
        self.tag = self._byte()
        high = self.tag >> 5
        if high == STR >> 5:
            return self._read(self._size()).decode("utf-8", "surrogatepass")
        if high == SINT >> 5:
            v = self.tag & 0x0F
            if self.tag & 0x10:
                v = (self._vint() << 4) | v
            return v
        if high == SLONG >> 5:
            v = self.tag & 0x0F
            if self.tag & 0x10:
                v = (self._vint() << 4) | v
            return JLong(v)
        if high == ARR >> 5:
            return [self.read_val() for _ in range(self._size())]
        if high in (ORDERED_MAP >> 5, NAMED_LST >> 5):
            nl = NamedList()
            for _ in range(self._size()):
                name = self.read_val()
                nl.add(name, self.read_val())
            return nl
        if high == EXTERN_STRING >> 5:
            idx = self._size()
            if idx != 0:
                return self._strings[idx - 1]
            s = self.read_val()
            self._strings.append(s)
            return s

        t = self.tag
        if t == NULL:
            return None
        if t == BOOL_TRUE:
            return True
        if t == BOOL_FALSE:
            return False
        if t == BYTE:
            return JByte(struct.unpack(">b", self._read(1))[0])
        if t == SHORT:
            return JShort(struct.unpack(">h", self._read(2))[0])
        if t == INT:
            return struct.unpack(">i", self._read(4))[0]
        if t == LONG:
            return JLong(struct.unpack(">q", self._read(8))[0])
        if t == FLOAT:
            return JFloat(struct.unpack(">f", self._read(4))[0])
        if t == DOUBLE:
            return struct.unpack(">d", self._read(8))[0]
        if t == DATE:
            millis = struct.unpack(">q", self._read(8))[0]
            return _dt.datetime.fromtimestamp(
                millis / 1000.0, tz=_dt.timezone.utc
            )
        if t == BYTEARR:
            return self._read(self._vint())
        if t == MAP:
            out: dict = {}
            for _ in range(self._vint()):
                k = self.read_val()
                out[k] = self.read_val()
            return out
        if t == SOLRDOC:
            nl = self.read_val()
            return SolrDocument((k, v) for k, v in nl)
        if t == SOLRDOCLST:
            header = self.read_val()
            docs = self.read_val()
            ms = header[2]
            return SolrDocumentList(
                docs,
                num_found=header[0],
                start=header[1],
                max_score=float(ms) if ms is not None else None,
            )
        if t == ITERATOR:
            items = []
            while True:
                o = self.read_val()
                if o is _END_OBJ:
                    return items
                items.append(o)
        if t == END:
            return _END_OBJ
        if t == SOLRINPUTDOC:
            sz = self._vint()
            doc_boost = float(self.read_val())
            doc = SolrInputDocument(doc_boost=doc_boost)
            for _ in range(sz):
                boost = 1.0
                name_or_boost = self.read_val()
                if isinstance(name_or_boost, JFloat):
                    boost = float(name_or_boost)
                    name = self.read_val()
                else:
                    name = name_or_boost
                doc[name] = self.read_val()
                if boost != 1.0:
                    doc.boosts[name] = boost
            return doc
        raise ValueError(f"Unknown javabin tag {t}")


def unmarshal(data: bytes) -> Any:
    dec = _Decoder(data)
    version = dec._byte()
    if version != VERSION:
        raise ValueError(
            f"Invalid version (expected {VERSION}, but {version}) or "
            "the data in not in 'javabin' format"
        )
    return dec.read_val()


def write_javabin(
    result: dict,
    params: dict[str, Any] | None = None,
    fl: list[str] | None = None,
    num_found: int | None = None,
    start: int = 0,
    qtime_ms: int = 0,
    max_score: float | None = None,
) -> bytes:
    """BinaryResponseWriter.write: marshal the response NamedList —
    responseHeader (status/QTime Ints, params SimpleOrderedMap) +
    SolrDocumentList + optional facet_counts tree — to javabin bytes.

    Reference: BinaryResponseWriter.java:49-58 (Resolver turns the
    DocList into a SolrDocumentList before JavaBinCodec.marshal).
    """
    from .response import _doc_rows, _facet_lists

    docs, _ = _doc_rows(result, fl)
    header = NamedList()
    header.add("status", 0)
    header.add("QTime", int(qtime_ms))
    p = NamedList()
    for k, v in (params or {}).items():
        p.add(k, str(v))
    header.add("params", p)

    dl = SolrDocumentList(
        [SolrDocument(d) for d in docs],
        num_found=num_found if num_found is not None else len(docs),
        start=start,
        max_score=max_score,
    )
    root = NamedList()
    root.add("responseHeader", header)
    root.add("response", dl)

    facets = _facet_lists(result)
    if facets:
        ff = NamedList()
        for field, flat in facets.items():
            fl_nl = NamedList()
            for i in range(0, len(flat), 2):
                fl_nl.add(str(flat[i]), int(flat[i + 1]))
            ff.add(field, fl_nl)
        fc = NamedList()
        fc.add("facet_queries", NamedList())
        fc.add("facet_fields", ff)
        fc.add("facet_dates", NamedList())
        fc.add("facet_ranges", NamedList())
        root.add("facet_counts", fc)
    return marshal(root)
