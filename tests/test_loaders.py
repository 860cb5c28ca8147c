"""Solr update-format loaders: CSV options, JSON repeated add-command
keys, XML multi-valued fields (solr/core/.../handler/loader/)."""

import pandas as pd


def test_csv_trim_and_split(spark, tmp_path):
    from lucene_solr_spark.io.loaders import load_csv

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,tags\n"
        '1, alpha ,"red|green|blue"\n'
        "2,beta,solo\n"
    )
    df = load_csv(
        spark,
        str(p),
        "id long, name string, tags string",
        trim=True,
        split_fields={"tags": "|"},
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["name"] == "alpha"  # TRIM strips padding
    assert rows[1]["tags"] == ["red", "green", "blue"]  # f.tags.split
    assert rows[2]["tags"] == ["solo"]


def test_csv_custom_separator(spark, tmp_path):
    from lucene_solr_spark.io.loaders import load_csv

    p = tmp_path / "in.tsv"
    p.write_text("id;name\n1;x\n2;y\n")
    df = load_csv(spark, str(p), "id long, name string", separator=";")
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (1, "x"),
        (2, "y"),
    ]


def test_json_repeated_add_keys(spark):
    """JsonLoader tolerates repeated 'add' keys in one command object —
    a plain dict parse would silently keep only the last one."""
    from lucene_solr_spark.io.loaders import load_json_commands

    payload = (
        '{"add": {"doc": {"id": 1, "v": "a"}},'
        ' "add": {"doc": {"id": 2, "v": "b"}},'
        ' "commit": {}}'
    )
    frame = spark.createDataFrame(pd.DataFrame({"payload": [payload]}))
    out = load_json_commands(frame, "payload", "id long, v string")
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_json_bare_array(spark):
    from lucene_solr_spark.io.loaders import load_json_commands

    frame = spark.createDataFrame(
        pd.DataFrame({"payload": ['[{"id": 5, "v": "z"}]']})
    )
    out = load_json_commands(frame, "payload", "id long, v string")
    assert [(r["id"], r["v"]) for r in out.collect()] == [(5, "z")]


def test_xml_multivalued_field(spark):
    """Repeated <field name=...> elements form a multi-valued field
    (XMLLoader.java doc parse)."""
    from lucene_solr_spark.io.loaders import _docs_from_xml

    docs = _docs_from_xml(
        "<add><doc>"
        '<field name="id">1</field>'
        '<field name="tag">a</field>'
        '<field name="tag">b &amp; c</field>'
        "</doc><doc>"
        '<field name="id">2</field>'
        '<field name="tag">solo</field>'
        "</doc></add>"
    )
    assert docs[0]["tag"] == ["a", "b & c"]  # entity unescape + list
    assert docs[1]["tag"] == "solo"
    assert docs[0]["id"] == "1"
