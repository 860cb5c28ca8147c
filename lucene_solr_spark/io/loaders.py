"""Solr update-format loaders: CSV, JSON add-commands, XML <add> docs.

References (solr/core/src/java/org/apache/solr/handler/loader/):
  - CSVLoaderBase.java:45-60,165-220 — params ``separator`` (default
    ','), ``header`` (default true), ``trim``, ``encapsulator``
    (default '"'), ``escape``, per-field ``f.<name>.split`` with
    ``f.<name>.separator`` for multi-valued columns.
  - JsonLoader.java — the JSON update format: either a bare array of
    documents ``[{...}, {...}]`` or a command object with (possibly
    REPEATED) ``add`` keys ``{"add": {"doc": {...}}, "add": ...}``;
    repeated keys are legal in Solr's streaming parser, so a
    pairs-hook parse is required, not a plain dict.
  - XMLLoader.java — ``<add><doc><field name="f">v</field>...`` with
    repeated same-name fields forming multi-valued fields.

Spark shape: CSV maps onto the native DataFrameReader (distributed,
pushdown-capable); JSON/XML command payloads arrive as one command
string per row and are parsed with an Arrow-batched mapInPandas —
parsing is the loader's intrinsic cost, but it stays fully
distributed and schema-stable.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    separator: str = ",",
    header: bool = True,
    trim: bool = False,
    encapsulator: str = '"',
    escape: str | None = None,
    split_fields: dict[str, str] | None = None,
) -> DataFrame:
    """CSVLoader analogue over the native CSV source. ``split_fields``
    maps column -> inner separator (f.<name>.split=true with
    f.<name>.separator, CSVLoaderBase.java:53,230-245), producing an
    array column. ``trim`` strips surrounding whitespace of every
    string cell (CSVLoaderBase TRIM)."""
    reader = (
        spark.read.schema(schema)
        .option("sep", separator)
        .option("header", str(header).lower())
        .option("quote", encapsulator)
        .option("multiLine", "true")
    )
    if escape is not None:
        reader = reader.option("escape", escape)
    df = reader.csv(path)
    if trim:
        for fld in df.schema.fields:
            if fld.dataType.typeName() == "string":
                df = df.withColumn(fld.name, F.trim(F.col(fld.name)))
    for col, sep in (split_fields or {}).items():
        df = df.withColumn(
            col,
            F.split(F.col(col), _re_escape(sep)),
        )
    return df


def _re_escape(sep: str) -> str:
    import re

    return re.escape(sep)


def _docs_from_json(payload: str) -> list[dict]:
    """JsonLoader.java command parse: bare array of docs, or a command
    object whose (repeatable) 'add' keys carry {'doc': {...}}."""
    data = json.loads(payload)
    if isinstance(data, list):
        return [d for d in data if isinstance(d, dict)]
    docs: list[dict] = []

    def pairs_hook(pairs):
        # keep EVERY 'add' occurrence — duplicate keys are legal in
        # the Solr streaming parser (JsonLoader processUpdate loop)
        for k, v in pairs:
            if k == "add" and isinstance(v, dict) and "doc" in v:
                docs.append(v["doc"])
        return dict(pairs)

    json.loads(payload, object_pairs_hook=pairs_hook)
    return docs


def load_json_commands(
    payloads: DataFrame, col: str, schema: str
) -> DataFrame:
    """Parse a frame of JSON update payload strings into docs with the
    given output schema — one Arrow batch pass, no driver parse."""
    fields = [f.strip().split()[0] for f in schema.split(",")]

    def run(it):
        for pdf in it:
            rows = []
            for s in pdf[col]:
                for d in _docs_from_json(s):
                    rows.append([d.get(f) for f in fields])
            yield pd.DataFrame(rows, columns=fields)

    return payloads.mapInPandas(run, schema)


def _docs_from_xml(payload: str) -> list[dict]:
    """XMLLoader.java <add><doc><field name=...> parse; repeated field
    names become lists (multi-valued)."""
    root = ET.fromstring(payload)
    adds = [root] if root.tag == "add" else root.findall(".//add")
    docs: list[dict] = []
    for add in adds:
        for doc in add.findall("doc"):
            d: dict = {}
            for fe in doc.findall("field"):
                name = fe.get("name")
                val = fe.text if fe.text is not None else ""
                if name in d:
                    prev = d[name]
                    if isinstance(prev, list):
                        prev.append(val)
                    else:
                        d[name] = [prev, val]
                else:
                    d[name] = val
            docs.append(d)
    return docs


def load_xml_commands(
    payloads: DataFrame, col: str, schema: str
) -> DataFrame:
    """Parse a frame of XML <add> payload strings into docs (all
    values strings, per XML) with the given output schema."""
    fields = [f.strip().split()[0] for f in schema.split(",")]

    def run(it):
        for pdf in it:
            rows = []
            for s in pdf[col]:
                for d in _docs_from_xml(s):
                    rows.append([d.get(f) for f in fields])
            yield pd.DataFrame(rows, columns=fields)

    return payloads.mapInPandas(run, schema)
