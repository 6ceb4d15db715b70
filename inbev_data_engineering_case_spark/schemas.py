"""Explicit schemas for the medallion layers and the synthetic star schema.

The reference's only explicit schema is sixteen nullable ``StringType`` fields
(reference dags/spark_fetch.py:33-50); its production CSV read infers
everything as string (dags/data_transformations_bronze_to_silver.py:84).
Here every layer has a pinned ``StructType`` — at 100 TB, schema inference is
both a correctness hazard (type drift between files) and a full extra pass
over the data, so readers always pass an explicit schema
(SURVEY.md §1.2, §4.3-3).

Improvements over the reference, per SURVEY.md §1.4:
- ``longitude``/``latitude`` are ``DoubleType`` in silver (the reference keeps
  them as strings forever).
- The six columns the reference's own profiling found 100%-populated
  (README.md:36) are non-nullable.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Bronze: the 16-column Open Brewery DB API record, all nullable strings —
# raw zone keeps exactly what the API sent (reference spark_fetch.py:33-50;
# header list fetch_data_with_meta_from_api.py:53-70).
BREWERY_BRONZE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("brewery_type", T.StringType(), False),
        T.StructField("address_1", T.StringType(), True),
        T.StructField("address_2", T.StringType(), True),
        T.StructField("address_3", T.StringType(), True),
        T.StructField("city", T.StringType(), False),
        T.StructField("state_province", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("country", T.StringType(), False),
        T.StructField("longitude", T.StringType(), True),
        T.StructField("latitude", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("website_url", T.StringType(), True),
        T.StructField("state", T.StringType(), False),
        T.StructField("street", T.StringType(), True),
    ]
)

# Silver: the 8-column cleansed projection
# (reference data_transformations_bronze_to_silver.py:88), with coordinates
# upgraded to double.
BREWERY_SILVER = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("brewery_type", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("country", T.StringType(), False),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), True),
    ]
)

# Gold: breweries per (type, country, state) — reference
# gold_data_aggregation.py:50.
BREWERY_GOLD = T.StructType(
    [
        T.StructField("brewery_type", T.StringType(), False),
        T.StructField("country", T.StringType(), False),
        T.StructField("state", T.StringType(), False),
        T.StructField("brewery_count", T.LongType(), False),
    ]
)

SILVER_COLUMNS = [f.name for f in BREWERY_SILVER.fields]

# Hive-partition layout per layer (reference
# data_transformations_bronze_to_silver.py:113, gold_data_aggregation.py:62).
SILVER_PARTITION_KEYS = ["country", "state"]
GOLD_PARTITION_KEYS = ["country"]
