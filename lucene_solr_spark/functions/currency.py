"""CurrencyField — money values with query-time exchange conversion.

Reference: solr/core/src/java/org/apache/solr/schema/CurrencyField.java
(+ CurrencyValue, FileExchangeRateProvider). The stored form is
"amount,CODE" (e.g. "4.50,USD"); internally amounts are LONG minor
units (4.50 USD -> 450 cents, per-currency fraction digits), and a
range query in any target currency converts at query time:

  convertAmount (CurrencyField.java:738-755): value = minor * rate,
  then scaled by 10^(targetDigits - sourceDigits), truncated to long.
  (The reference scales with a loop of *=10.0 / *=0.1 steps; this
  engine multiplies by the power once — a documented half-ulp-class
  deviation, mirrored identically by the oracle twin.)

Rates come from a provider table of (from, to, rate) rows — the
FileExchangeRateProvider analogue (currency.xml's <rate from= to=
rate=/>); asymmetric rates are honored exactly as the file lists them,
identity rates are implicit. OpenExchangeRatesOrgProvider (remote
JSON feed) is out of scope — the provider contract is the table.

Spark-first: parsing and conversion are pure Catalyst expressions over
a broadcast rate map, so a currency range/sort is an ordinary
pushed-down predicate at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# java.util.Currency default fraction digits for the codes the tests
# and gates use (ISO 4217)
FRACTION_DIGITS = {
    "USD": 2, "EUR": 2, "GBP": 2, "CHF": 2,
    "JPY": 0, "KWD": 3,
}


def parse_currency(col: Column) -> Column:
    """'amount,CODE' -> struct(minor long, code string): the stored
    long minor units. CurrencyValue.parse (CurrencyField.java ~689)
    uses Math.round(value * 10^digits) — half-up rounding, i.e.
    floor(x + 0.5) — so binary-inexact decimals like 1.15 still store
    115 cents."""
    amt = F.split(col, ",").getItem(0).try_cast("double")
    code = F.upper(F.trim(F.split(col, ",").getItem(1)))
    digits = _digits_col(code)
    minor = F.floor(
        amt * F.pow(F.lit(10.0), digits) + F.lit(0.5)
    ).cast("long")
    return F.struct(minor.alias("minor"), code.alias("code"))


def _digits_col(code: Column) -> Column:
    expr = F.lit(2)
    for c, d in FRACTION_DIGITS.items():
        expr = F.when(code == c, F.lit(d)).otherwise(expr)
    return expr


def _rate_map(rates: dict[tuple[str, str], float]):
    flat = []
    for (src, dst), r in rates.items():
        flat.extend([F.lit(f"{src}>{dst}"), F.lit(float(r))])
    return F.create_map(*flat) if flat else F.create_map()


def convert_minor(
    cur: Column, target: str, rates: dict[tuple[str, str], float]
) -> Column:
    """CurrencyValue.convertTo: minor units in the target currency —
    minor * rate scaled by 10^(targetDigits - sourceDigits), truncated
    toward zero (the reference's (long) cast). Identity when codes
    match; null (never a guess) for a missing rate."""
    code = cur["code"]
    m = _rate_map(rates)
    rate = F.when(code == F.lit(target), F.lit(1.0)).otherwise(
        m[F.concat(code, F.lit(">"), F.lit(target))]
    )
    tgt_digits = _digits_col(F.lit(target))
    delta = tgt_digits - _digits_col(code)
    val = (
        cur["minor"].cast("double")
        * rate
        * F.pow(F.lit(10.0), delta.cast("double"))
    )
    # (long) cast truncates toward zero
    return F.when(
        rate.isNotNull(),
        F.when(val >= 0, F.floor(val)).otherwise(-F.floor(-val)),
    ).cast("long")


def currency_range(
    df: DataFrame,
    field: str,
    lower: float,
    upper: float,
    target: str,
    rates: dict[tuple[str, str], float],
    out_col: str = "converted_minor",
) -> DataFrame:
    """CurrencyField range query: keep docs whose converted value lies
    in [lower, upper] of the TARGET currency (bounds given in major
    units, scaled to minor like the reference's query parsing)."""
    cur = parse_currency(F.col(field))
    conv = convert_minor(cur, target, rates)
    scale = 10 ** FRACTION_DIGITS.get(target, 2)
    lo = int(lower * scale)
    hi = int(upper * scale)
    return df.withColumn(out_col, conv).where(
        F.col(out_col).between(lo, hi)
    )
