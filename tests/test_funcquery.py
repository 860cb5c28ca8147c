"""ValueSource expression parser tests (search/funcquery.py)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.search.funcquery import FuncParseError, parse_func


def _eval(spark, expr, n_chars=250):
    df = spark.createDataFrame([(n_chars,)], "n_chars long")
    return df.select(parse_func(expr).alias("v")).collect()[0]["v"]


def test_recip_linear_math(spark):
    assert _eval(spark, "recip(n_chars,1,1000,1000)") == pytest.approx(
        1000.0 / (250 + 1000.0)
    )
    assert _eval(spark, "linear(n_chars,2,5)") == pytest.approx(505.0)
    assert _eval(spark, "div(n_chars,10)") == pytest.approx(25.0)
    assert _eval(
        spark, "sum(n_chars, product(2, 3), 1)"
    ) == pytest.approx(257.0)
    assert _eval(spark, "log(n_chars)") == pytest.approx(2.39794, abs=1e-5)
    assert _eval(spark, "sqrt(pow(n_chars, 2))") == pytest.approx(250.0)
    assert _eval(spark, "abs(-3.5)") == pytest.approx(3.5)


def test_nested_and_constants(spark):
    v = _eval(spark, "recip(sum(n_chars, 50), 1, 600, 600)")
    assert v == pytest.approx(600.0 / (300 + 600.0))
    assert _eval(spark, "3.25") == pytest.approx(3.25)
    assert _eval(spark, "n_chars") == pytest.approx(250.0)


def test_parse_errors():
    for bad in ("recip(n_chars,1,1000)", "nope(1)", "sum(1,", "1 2"):
        with pytest.raises(FuncParseError):
            parse_func(bad)
