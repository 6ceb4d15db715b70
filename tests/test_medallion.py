"""Golden end-to-end test: brewery-shaped fixture → bronze → silver → gold
(SURVEY.md §5.2), with the reference's invariants asserted:
- silver row count == bronze row count (cleansing is row-preserving),
- gold sum(brewery_count) == silver row count,
- silver partition layout is country=/state=/ (Hive-style),
- gold silver schema matches the pinned StructTypes."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

from inbev_data_engineering_case_spark import layers
from inbev_data_engineering_case_spark.operators.medallion import (
    bronze_to_silver,
    silver_to_gold,
)
from inbev_data_engineering_case_spark.pipeline import run_pipeline
from inbev_data_engineering_case_spark.schemas import (
    BREWERY_BRONZE,
    SILVER_COLUMNS,
)

BRONZE_COLUMNS = [f.name for f in BREWERY_BRONZE.fields]

FIXTURE_ROWS = [
    # id, name, type, city, state, country (+ nulls elsewhere)
    ("b1", "Cafe Okei", "micro", "Klagenfurt am W�rthersee", "K�rnten", "Austria"),
    ("b2", "Wimitzbr�u", "micro", "Wien", "Wien", "Austria"),
    ("b3", "Plain Brew", "brewpub", "New York", "New York", " United States"),
    ("b4", "Under_Score", "brewpub", "São Paulo", "São Paulo", "Brazil"),
    ("b5", "Dup Brew", "micro", "New York", "New York", "United States"),
]


def write_bronze_fixture(base_dir: str, run_id: str) -> str:
    folder = os.path.join(base_dir, "bronze", f"brewery_data_{run_id}")
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, "page_0.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(BRONZE_COLUMNS)
        for bid, name, btype, city, state, country in FIXTURE_ROWS:
            record = dict.fromkeys(BRONZE_COLUMNS, "")
            record.update(
                id=bid, name=name, brewery_type=btype,
                city=city, state=state, country=country,
                longitude="-47.9", latitude="15.8",
            )
            w.writerow([record[c] for c in BRONZE_COLUMNS])
    return folder


def test_pipeline_end_to_end(spark, tmp_path):
    lake = str(tmp_path / "lake")
    write_bronze_fixture(lake, "2024-01-01-00-00")
    result = run_pipeline(spark, lake, "2024-01-01-00-01")

    silver = spark.read.parquet(result.silver_path)
    gold = spark.read.parquet(result.gold_path)

    # Row-preserving cleanse; counts add up.
    assert silver.count() == len(FIXTURE_ROWS)
    assert gold.agg(F.sum("brewery_count")).first()[0] == len(FIXTURE_ROWS)

    # Partition layout: country=/state=/ under silver, country= under gold.
    countries = {d for d in os.listdir(result.silver_path) if d.startswith("country=")}
    assert countries == {"country=austria", "country=united-states", "country=brazil"}
    state_dirs = os.listdir(os.path.join(result.silver_path, "country=austria"))
    assert sorted(d for d in state_dirs if d.startswith("state=")) == [
        "state=karnten", "state=wien"
    ]
    silver_rows = {r["id"]: r for r in silver.collect()}
    assert silver_rows["b3"]["country"] == "united-states"
    assert silver_rows["b5"]["country"] == "united-states"  # trim dup collapsed
    assert silver_rows["b1"]["state"] == "karnten"  # mojibake repaired
    assert silver_rows["b1"]["city"] == "klagenfurt-am-worthersee"
    assert silver_rows["b4"]["city"] == "sao-paulo"  # accents folded
    assert silver_rows["b4"]["name"] == "Under_Score"  # name keeps \p{Pc}
    assert silver_rows["b2"]["name"] == "Wimitzbrau"

    # Engine upgrade: coordinates are doubles now.
    assert dict(silver.dtypes)["longitude"] == "double"
    assert sorted(silver.columns) == sorted(SILVER_COLUMNS)

    # Gold view was registered in the global temp catalog.
    assert "brewery_counts" in result.views

    # Latest-snapshot resolution finds what we just wrote.
    assert layers.latest_snapshot(
        os.path.join(lake, "silver"), require_success=True
    ) == result.silver_path


def test_gold_agg_shape(spark):
    df = spark.createDataFrame(
        [("micro", "at", "wien"), ("micro", "at", "wien"), ("nano", "br", "sp")],
        ["brewery_type", "country", "state"],
    )
    out = {tuple(r) for r in silver_to_gold(df).collect()}
    assert out == {("micro", "at", "wien", 2), ("nano", "br", "sp", 1)}
