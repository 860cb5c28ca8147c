"""DataImportHandler transformers — the DIH entity field pipeline.

Reference (solr/contrib/dataimporthandler/src/java/org/apache/solr/
handler/dataimport/):
  - RegexTransformer.java:70-145 — per entity field with ``regex`` /
    ``splitBy`` / ``replaceWith`` / ``groupNames``: splitBy produces a
    String.split list; replaceWith returns ``m.find() ?
    m.replaceAll(replaceWith) : null`` (NULL on no match, not the
    input); a bare regex extracts group 1, or all groups as a list, or
    named columns via comma-separated groupNames; ``sourceColName``
    reads a different input column than the one written.
  - TemplateTransformer.java:40-75 — ``template="${a}/${b}"``: skipped
    entirely if any variable is unresolvable; a single-variable
    whole-string template passes the raw value through (type
    preserved), anything else string-concatenates.
  - DateFormatTransformer.java:43-88 — ``dateTimeFormat`` parses the
    trimmed source string to a timestamp; blank strings become NULL.

Spark shape: every transformer is a pure Catalyst projection (when /
regexp_replace / regexp_extract / split / concat / to_timestamp) — no
UDFs, so the whole DIH pipeline stays inside whole-stage codegen and
scales as a map-only pass. Array-typed inputs (the reference's List
branch) go through ``F.transform`` elementwise; ``splitBy`` over an
array flattens per-element splits exactly like the reference's
``results.addAll`` loop. ``F.split(..., limit=0)`` mirrors
java.lang.String#split's trailing-empty removal.

Out of scope: ScriptTransformer (embedded JS engine) and the
JDBC/HTTP data sources — loaders.py's CSV/JSON/XML cover the
file-shaped sources the sandbox can exercise.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_VAR_RX = re.compile(r"\$\{([^}]+)\}")


def _is_array(df: DataFrame, col: str) -> bool:
    try:
        return df.schema[col].dataType.typeName() == "array"
    except KeyError:
        return False


def _elementwise(df: DataFrame, src: str, fn) -> Column:
    """Apply a Column->Column fn to a scalar column, or elementwise
    over an array column (RegexTransformer's List input branch)."""
    if _is_array(df, src):
        return F.transform(F.col(src), fn)
    return fn(F.col(src))


def _java_split(x: Column, split_by: str) -> Column:
    """java.lang.String#split(regex) semantics: trailing empty strings
    are removed (Spark's split keeps them); ``""`` splits to [""]."""
    arr = F.split(x, split_by, -1)
    last_nonempty = F.aggregate(
        F.transform(
            arr,
            lambda e, i: F.when(e != "", i + 1).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: F.greatest(acc, v),
    )
    return F.when(x == "", F.array(F.lit(""))).otherwise(
        F.slice(arr, F.lit(1), last_nonempty)
    )


def _regex_field(df: DataFrame, field: dict) -> dict[str, Column]:
    col = field["column"]
    src = field.get("sourceColName", col)
    regex = field.get("regex")
    split_by = field.get("splitBy")
    replace_with = field.get("replaceWith")
    group_names = field.get("groupNames")
    if split_by is not None:
        if _is_array(df, src):
            # results.addAll per input string — flatten
            return {
                col: F.flatten(
                    F.transform(
                        F.col(src),
                        lambda x: _java_split(x, split_by),
                    )
                )
            }
        return {col: _java_split(F.col(src), split_by)}
    if replace_with is not None:
        fn = lambda x: F.when(  # noqa: E731
            x.rlike(regex), F.regexp_replace(x, regex, replace_with)
        )  # otherwise NULL — RegexTransformer.java:92
        return {col: _elementwise(df, src, fn)}
    n_groups = re.compile(regex).groups
    if n_groups <= 1:
        fn = lambda x: F.when(  # noqa: E731
            x.rlike(regex), F.regexp_extract(x, regex, 1)
        )
        return {col: _elementwise(df, src, fn)}
    if group_names:
        names = [g.strip() for g in group_names.split(",")]
        out: dict[str, Column] = {}

        def _extract_group(i: int):
            # a closure, NOT a default-arg lambda: F.transform treats a
            # 2-parameter callable as (element, index)
            return lambda x: F.when(
                x.rlike(regex), F.regexp_extract(x, regex, i)
            )

        for i, name in enumerate(names[:n_groups], start=1):
            if not name:
                continue  # blank slots are skipped (readfromRegExp)
            out[name] = _elementwise(df, src, _extract_group(i))
        return out
    fn = lambda x: F.when(  # noqa: E731
        x.rlike(regex),
        F.array(
            *[F.regexp_extract(x, regex, i) for i in range(1, n_groups + 1)]
        ),
    )
    return {col: _elementwise(df, src, fn)}


def _template_field(
    df: DataFrame, field: dict, variables: dict | None
) -> dict[str, Column]:
    col = field["column"]
    expr = field["template"]
    variables = variables or {}
    vars_in = _VAR_RX.findall(expr)

    def _resolve(v: str) -> Column | None:
        # entity-qualified names resolve by their last segment against
        # the row, then against the global variable map
        leaf = v.split(".")[-1]
        if leaf in df.columns:
            return F.col(leaf)
        if v in variables:
            return F.lit(variables[v])
        if leaf in variables:
            return F.lit(variables[leaf])
        return None

    resolved = [_resolve(v) for v in vars_in]
    if any(r is None for r in resolved):
        return {}  # unresolvable variable — whole field skipped
    if len(vars_in) == 1 and expr == "${" + vars_in[0] + "}":
        return {col: resolved[0]}  # raw pass-through, type preserved
    parts: list[Column] = []
    last = 0
    for m, r in zip(_VAR_RX.finditer(expr), resolved):
        if m.start() > last:
            parts.append(F.lit(expr[last : m.start()]))
        parts.append(r.cast("string"))
        last = m.end()
    if last < len(expr):
        parts.append(F.lit(expr[last:]))
    return {col: F.concat(*parts)}


def _date_field(df: DataFrame, field: dict) -> dict[str, Column]:
    col = field["column"]
    src = field.get("sourceColName", col)
    fmt = field["dateTimeFormat"]
    fn = lambda x: F.when(  # noqa: E731
        F.length(F.trim(x)) > 0, F.to_timestamp(F.trim(x), fmt)
    )
    return {col: _elementwise(df, src, fn)}


def dih_transform(
    df: DataFrame,
    fields: list[dict],
    variables: dict | None = None,
    transformers: tuple[str, ...] = ("regex", "template", "date"),
) -> DataFrame:
    """Run the DIH transformer chain over ``df``. Each transformer
    iterates over every entity field and handles only its own
    attributes, in the declared chain order — exactly the reference's
    ``transformer="RegexTransformer,TemplateTransformer,..."``
    dispatch (EntityProcessorWrapper.applyTransformer)."""
    for t in transformers:
        for field in fields:
            # applied field-by-field so later fields see earlier
            # outputs — the reference mutates the row map in place
            new_cols: dict[str, Column] = {}
            if t == "regex" and (
                field.get("regex") is not None
                or field.get("splitBy") is not None
            ):
                new_cols = _regex_field(df, field)
            elif t == "template" and field.get("template") is not None:
                new_cols = _template_field(df, field, variables)
            elif t == "date" and field.get("dateTimeFormat") is not None:
                new_cols = _date_field(df, field)
            if new_cols:
                df = df.withColumns(new_cols)
    return df


def entity_join(
    parent: DataFrame,
    child: DataFrame,
    on: tuple[str, str],
    multivalued: dict[str, str],
) -> DataFrame:
    """Nested DIH entities: one output doc per ROOT entity row with
    the sub-entity's fields multivalued (DocBuilder.buildDocument's
    recursion over <entity> children; CachedSqlEntityProcessor caches
    the child rows per join key — the hash-join analogue,
    solr/contrib/dataimporthandler/.../DocBuilder.java +
    CachedSqlEntityProcessor.java).

    Spark shape: pre-aggregate the child side to one row per key
    (collect_list sorted for determinism), then join — the child agg
    is the DIH cache, and Catalyst broadcasts it when small. ``on`` is
    (parent_key, child_key); ``multivalued`` maps output column ->
    child column."""
    pk, ck = on
    aggs = [
        F.sort_array(F.collect_list(src)).alias(out)
        for out, src in multivalued.items()
    ]
    child_agg = child.groupBy(F.col(ck).alias(pk)).agg(*aggs)
    out = parent.join(child_agg, on=pk, how="left")
    for out_col in multivalued:
        elem_t = dict(
            (f.name, f.dataType)
            for f in child_agg.schema.fields
        )[out_col].simpleString()
        out = out.withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast(elem_t)),
        )
    return out
