"""JavaBin codec goldens + round-trips.

Golden byte strings are hand-derived from JavaBinCodec.java's wire
rules (tag table :42-76, writeTag :287-300, writeInt :486-503,
writeLong :513-525, writeExternString) so encoder and decoder cannot
share a bug and still pass.
"""

import datetime as dt

import pytest

from lucene_solr_spark.search.javabin import (
    JByte,
    JFloat,
    JLong,
    JShort,
    NamedList,
    SolrDocument,
    SolrDocumentList,
    SolrInputDocument,
    marshal,
    unmarshal,
)


def test_golden_small_namedlist():
    nl = NamedList().add("a", 1).add("b", "xy")
    # 02 | ORDERED_MAP|2 | ES|0 STR|1 'a' | SINT|1 | ES|0 STR|1 'b' | STR|2 'xy'
    assert marshal(nl) == bytes(
        [0x02, 0xA2, 0xE0, 0x21, 0x61, 0x41, 0xE0, 0x21, 0x62, 0x22, 0x78, 0x79]
    )


def test_golden_array_long_null_bool():
    # JLong(20): 0x60|0x10|(20&0xf) = 0x74 then vlong(20>>4)=0x01
    assert marshal([JLong(20), None, True]) == bytes(
        [0x02, 0x83, 0x74, 0x01, 0x00, 0x01]
    )


def test_golden_int_paths():
    # small positive int packs into the tag byte
    assert marshal(5) == bytes([0x02, 0x45])
    # boundary: 0x0f needs the vint continuation (b|=0x10, vint(0))
    assert marshal(0x0F) == bytes([0x02, 0x5F, 0x00])
    # zero and negatives take the fixed-width INT path (writeInt: val > 0)
    assert marshal(0) == bytes([0x02, 0x06, 0, 0, 0, 0])
    assert marshal(-1) == bytes([0x02, 0x06, 0xFF, 0xFF, 0xFF, 0xFF])


def test_golden_string_interning_backref():
    nl = NamedList().add("id", 1).add("id", 2)
    # second "id" is a 1-based back-reference: EXTERN_STRING|1 = 0xE1
    assert marshal(nl) == bytes(
        [0x02, 0xA2, 0xE0, 0x22, 0x69, 0x64, 0x41, 0xE1, 0x42]
    )


def test_golden_size_overflow_vint():
    # 40 strings in an ARR: size 40 >= 0x1f -> tag|0x1f then vint(40-31)
    data = marshal([""] * 40)
    assert data[:3] == bytes([0x02, 0x80 | 0x1F, 9])


def test_roundtrip_primitives():
    vals = [
        None,
        True,
        False,
        "hello",
        "héllo ☃ \U0001f600",
        "",
        0,
        1,
        -17,
        14,
        15,
        16,
        123456789,
        -(1 << 30),
        (1 << 40),  # exceeds Java int -> long path
        JLong(0),
        JLong(7),
        JLong(1 << 50),
        JLong(-5),
        3.14159,
        JFloat(2.5),
        JByte(-3),
        JShort(-300),
        b"\x00\x01\xff",
        dt.datetime(2011, 5, 2, 12, 30, 45, tzinfo=dt.timezone.utc),
    ]
    for v in vals:
        got = unmarshal(marshal(v))
        assert got == v, (v, got)
    # type fidelity on the numeric wrappers
    assert isinstance(unmarshal(marshal(JLong(7))), JLong)
    assert isinstance(unmarshal(marshal(JFloat(2.5))), JFloat)


def test_roundtrip_containers():
    nl = NamedList().add("a", [1, 2, "x"]).add("m", {"k": JLong(9)})
    got = unmarshal(marshal(nl))
    assert got.get("a") == [1, 2, "x"]
    assert got.get("m") == {"k": 9}
    doc = SolrDocument(id="d1", score=JFloat(1.5), tags=["a", "b"])
    got = unmarshal(marshal(doc))
    assert got == {"id": "d1", "score": 1.5, "tags": ["a", "b"]}
    assert isinstance(got, SolrDocument)


def test_roundtrip_solr_document_list():
    dl = SolrDocumentList(
        [SolrDocument(id="1"), SolrDocument(id="2")],
        num_found=57,
        start=10,
        max_score=3.25,
    )
    got = unmarshal(marshal(dl))
    assert got == dl
    assert got.num_found == 57 and got.start == 10 and got.max_score == 3.25
    # null maxScore (Solr omits score unless requested)
    dl2 = SolrDocumentList([], num_found=0, start=0, max_score=None)
    assert unmarshal(marshal(dl2)).max_score is None


def test_roundtrip_solr_input_document():
    doc = SolrInputDocument(
        {"id": "x", "title": "hi"}, doc_boost=2.0, boosts={"title": 3.0}
    )
    got = unmarshal(marshal(doc))
    assert dict(got) == {"id": "x", "title": "hi"}
    assert got.doc_boost == 2.0
    assert got.boosts == {"title": 3.0}


def test_roundtrip_deep_interning():
    # 40 distinct names forces extern index past the 0x1f size overflow
    nl = NamedList()
    for i in range(40):
        nl.add(f"f{i}", i)
    nl2 = NamedList()
    for i in range(40):
        nl2.add(f"f{i}", -i)  # all back-references
    got = unmarshal(marshal([nl, nl2]))
    assert got[0].as_dict() == {f"f{i}": i for i in range(40)}
    assert got[1].as_dict() == {f"f{i}": -i for i in range(40)}


def test_version_check():
    with pytest.raises(ValueError):
        unmarshal(b"\x01\x00")


def test_write_javabin_response(spark):
    from lucene_solr_spark.search.javabin import write_javabin

    df = spark.createDataFrame(
        [("d1", 2.0), ("d2", 1.0)], ["doc_id", "score"]
    )
    data = write_javabin(
        {"response": df},
        params={"q": "body:hello", "wt": "javabin"},
        num_found=42,
        start=0,
        qtime_ms=7,
        max_score=2.0,
    )
    tree = unmarshal(data)
    assert isinstance(tree, NamedList)
    hdr = tree.get("responseHeader")
    assert hdr.get("status") == 0 and hdr.get("QTime") == 7
    assert hdr.get("params").get("wt") == "javabin"
    resp = tree.get("response")
    assert isinstance(resp, SolrDocumentList)
    assert resp.num_found == 42
    assert [d["doc_id"] for d in resp] == ["d1", "d2"]
    assert resp.max_score == 2.0


def test_truncated_stream_raises_eoferror():
    data = marshal(NamedList().add("a", [1, "xy", JLong(99)]))
    import pytest as _pytest

    for cut in range(1, len(data)):
        with _pytest.raises((EOFError, ValueError)):
            unmarshal(data[:cut])
    with _pytest.raises(EOFError):
        unmarshal(b"")


# ---- hypothesis round-trip fuzz --------------------------------------------
try:
    from hypothesis import given, settings, strategies as st

    _scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.text(max_size=40),
        st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
        st.integers(min_value=0, max_value=(1 << 55)).map(JLong),
        st.floats(allow_nan=False, allow_infinity=False),
        st.binary(max_size=24),
    )

    def _trees(children):
        return st.one_of(
            st.lists(children, max_size=5),
            st.dictionaries(st.text(max_size=8), children, max_size=4),
            st.builds(
                lambda pairs: NamedList(pairs),
                st.lists(
                    st.tuples(st.text(max_size=8), children), max_size=4
                ),
            ),
        )

    _values = st.recursive(_scalars, _trees, max_leaves=20)

    @given(_values)
    @settings(max_examples=300, deadline=None)
    def test_roundtrip_fuzz(v):
        assert unmarshal(marshal(v)) == v

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
