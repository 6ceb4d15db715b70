"""Every catalog query vs its DuckDB oracle at sf0.001 (fast), replicating
the driver's row-count + column-name + value-hash gate. The driver itself
runs sf0.01; tools/check_oracle.py covers that interactively."""

from __future__ import annotations

import pytest

from inbev_data_engineering_case_spark.queries import CATALOG
from inbev_data_engineering_case_spark.testing import (
    compare_query,
    duckdb_star_connection,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_star_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(CATALOG))
def test_query_matches_oracle(spark, oracle_con, name):
    msg = compare_query(CATALOG[name], spark, oracle_con, SF_DIR)
    assert msg is None, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) == set(CATALOG)
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip().upper().startswith("SELECT") or "WITH" in sql.upper()
