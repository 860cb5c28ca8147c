"""DataImportHandler transformer chain (io/dih.py) — RegexTransformer /
TemplateTransformer / DateFormatTransformer reference semantics."""

import datetime

import pytest

from lucene_solr_spark.io.dih import dih_transform


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [
            (1, "a,b,c", "src42", "en", "2024-01-15 10:30:00", [
                "x1y", "nope"]),
            (2, "one", "misc", "de", "", ["z9w", "a7b"]),
            (3, "a,,b,,", None, "en-us", "  2023-12-01 00:00:00  ",
             None),
        ],
        "id long, csv string, source string, lang string, "
        "ts_str string, arr array<string>",
    )


def test_regex_extract_null_on_no_match(rows):
    out = dih_transform(
        rows,
        [{"column": "num", "sourceColName": "source",
          "regex": r"src(\d+)"}],
    )
    got = {r["id"]: r["num"] for r in out.collect()}
    # readfromRegExp returns null when find() fails — NOT the input
    assert got == {1: "42", 2: None, 3: None}


def test_replace_with_null_on_no_match(rows):
    out = dih_transform(
        rows,
        [{"column": "lang2", "sourceColName": "lang",
          "regex": "en", "replaceWith": "EN"}],
    )
    got = {r["id"]: r["lang2"] for r in out.collect()}
    # m.find() ? m.replaceAll(...) : null (RegexTransformer.java:92)
    assert got == {1: "EN", 2: None, 3: "EN-us"}


def test_split_by_drops_trailing_empties_like_java(rows):
    out = dih_transform(
        rows, [{"column": "parts", "sourceColName": "csv",
                "splitBy": ","}]
    )
    got = {r["id"]: r["parts"] for r in out.collect()}
    assert got[1] == ["a", "b", "c"]
    assert got[2] == ["one"]
    # java String.split drops TRAILING empty strings only
    assert got[3] == ["a", "", "b"]


def test_group_names_make_columns(rows):
    out = dih_transform(
        rows,
        [{"column": "ignored", "sourceColName": "source",
          "regex": r"(src)(\d+)", "groupNames": "tag,num"}],
    )
    r1 = {r["id"]: (r["tag"], r["num"]) for r in out.collect()}
    assert r1[1] == ("src", "42")
    assert r1[2] == (None, None)


def test_multi_group_without_names_is_array(rows):
    out = dih_transform(
        rows,
        [{"column": "groups", "sourceColName": "source",
          "regex": r"(src)(\d+)"}],
    )
    got = {r["id"]: r["groups"] for r in out.collect()}
    assert got[1] == ["src", "42"]
    assert got[2] is None


def test_template_concat_and_skip_unresolvable(rows):
    out = dih_transform(
        rows,
        [
            {"column": "tpl", "template": "${source}-${lang}"},
            {"column": "tpl2", "template": "${nosuchvar}!"},
            {"column": "tpl3", "template": "${g}", },
        ],
        variables={"g": 7},
    )
    assert "tpl2" not in out.columns  # unresolvable — field skipped
    row = {r["id"]: r for r in out.collect()}
    assert row[1]["tpl"] == "src42-en"
    # single-variable whole-string template: raw value, type preserved
    assert row[1]["tpl3"] == 7 and isinstance(row[1]["tpl3"], int)


def test_date_format_blank_is_null(rows):
    out = dih_transform(
        rows,
        [{"column": "ts", "sourceColName": "ts_str",
          "dateTimeFormat": "yyyy-MM-dd HH:mm:ss"}],
    )
    got = {r["id"]: r["ts"] for r in out.collect()}
    assert got[1] == datetime.datetime(2024, 1, 15, 10, 30)
    assert got[2] is None  # blank after trim (process() length==0)
    assert got[3] == datetime.datetime(2023, 12, 1)  # trimmed first


def test_array_input_elementwise(rows):
    out = dih_transform(
        rows,
        [{"column": "ex", "sourceColName": "arr",
          "regex": r"([a-z])(\d)", "groupNames": "letter,digit"}],
    )
    got = {r["id"]: (r["letter"], r["digit"]) for r in out.collect()}
    assert got[1] == (["x", None], ["1", None])
    assert got[2] == (["z", "a"], ["9", "7"])


def test_chain_order_later_transformer_sees_earlier_output(rows):
    out = dih_transform(
        rows,
        [
            {"column": "num", "sourceColName": "source",
             "regex": r"src(\d+)"},
            {"column": "labeled", "template": "n=${num}"},
        ],
    )
    got = {r["id"]: r["labeled"] for r in out.collect()}
    assert got[1] == "n=42"


def test_entity_join_multivalued_and_empty_parent(spark):
    from lucene_solr_spark.io.dih import entity_join

    parent = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "empty")], "pk long, name string"
    )
    child = spark.createDataFrame(
        [(1, "z"), (1, "x"), (2, "y")], "fk long, val string"
    )
    out = {
        r["pk"]: r["vals"]
        for r in entity_join(
            parent, child, on=("pk", "fk"), multivalued={"vals": "val"}
        ).collect()
    }
    assert out[1] == ["x", "z"]  # sorted for determinism
    assert out[2] == ["y"]
    assert out[3] == []  # parent without children keeps an empty list
