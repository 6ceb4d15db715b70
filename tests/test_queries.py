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


# The measured >= ~6s tail of the sweep (heavy multi-stage compositions:
# the daily loop, curate variants, double-trained IVF) runs under the
# `slow` marker — still part of every full-suite run (`-m ""`), just not
# of the driver-budget default; the driver's own oracle gate covers its
# 50-entry window independently of this sweep.
_SLOW_ORACLE = {
    "q_ann_ivf_trained", "q_curate_classifier", "q_curate_corpus",
    "q_curate_halo", "q_curate_incremental", "q_curate_split",
    "q_curation_report_halo", "q_daily_budget", "q_daily_loop",
    "q_leakage_incremental", "q_random_projection", "q_simhash_incremental",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
        for n in CATALOG
    ],
)
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
