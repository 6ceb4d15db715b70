"""Unit tests for the cleansing expression library (OP-11..OP-16) on the
exact edge cases from the reference's own data profiling (SURVEY.md §5.2,
FIXTURES.md §1): leading-space country dup, mixed case, U+FFFD mojibake,
accented chars, connector punctuation, nulls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.operators.normalize import (
    MOJIBAKE_RULES,
    accent_fold_table,
    clean_text,
    normalize_location,
    repair_mojibake,
)


def apply_expr(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], ["c"])
    return [r[0] for r in df.select(expr_fn("c")).collect()]


def test_normalize_location_trim_dup(spark):
    # The profiled " United States" vs "United States" duplicate
    # (reference README.md:37) must collapse to one value.
    out = apply_expr(spark, [" United States", "United States"], normalize_location)
    assert out == ["united-states", "united-states"]


def test_normalize_location_case_and_spaces(spark):
    out = apply_expr(spark, ["New York City", "SÃO PAULO"], normalize_location)
    assert out[0] == "new-york-city"
    assert out[1] == "sÃo paulo".replace(" ", "-").lower()


def test_normalize_location_null(spark):
    df = spark.createDataFrame([(None,)], "c string")
    assert df.select(normalize_location("c")).first()[0] is None


@pytest.mark.parametrize(
    ("col_name", "raw", "expected"),
    [
        ("state", "k�rnten", "karnten"),
        ("state", "nieder�sterreich", "niederosterreich"),
        ("city", "klagenfurt-am-w�rthersee", "klagenfurt-am-worthersee"),
        ("name", "Caf� Okei", "Cafe Okei"),
        ("name", "Wimitzbr�u", "Wimitzbrau"),
        (
            "name",
            "Anheuser-Busch Inc ̢���� Williamsburg",
            "Anheuser-Busch/Inbev Williamsburg Brewery",
        ),
    ],
)
def test_mojibake_rules(spark, col_name, raw, expected):
    out = apply_expr(
        spark, [raw], lambda c: repair_mojibake(c, MOJIBAKE_RULES[col_name])
    )
    assert out == [expected]


def test_clean_text_folds_accents_and_strips_connectors(spark):
    out = apply_expr(spark, ["kärnten", "a_b__c", "über-höfen"], clean_text)
    assert out == ["karnten", "abc", "uber-hofen"]


def test_clean_text_preserves_plain_ascii(spark):
    vals = ["plain text 123", "UPPER-case"]
    assert apply_expr(spark, vals, clean_text) == vals


def test_accent_fold_table_cached_and_wellformed():
    m1, r1 = accent_fold_table()
    m2, r2 = accent_fold_table()
    assert m1 is m2  # cached, computed once per process (SURVEY.md §4.3-1)
    assert len(m1) == len(r1) > 500
    assert "ä" in m1 and r1[m1.index("ä")] == "a"
    assert "Ü" in m1 and r1[m1.index("Ü")] == "U"


def test_full_silver_chain_on_location_key(spark):
    # Composition in reference order: normalize_location → mojibake → clean_text
    df = spark.createDataFrame([(" Klagenfurt am W�rthersee",)], ["city"])
    df = df.withColumn("city", normalize_location("city"))
    df = df.withColumn("city", repair_mojibake("city", MOJIBAKE_RULES["city"]))
    df = df.withColumn("city", clean_text("city"))
    assert df.first()[0] == "klagenfurt-am-worthersee"
