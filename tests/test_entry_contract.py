"""Driver-contract guard: exercise __spark_entry__ the way the grading
driver does — a VANILLA SparkSession (none of the engine's session
defaults: ANSI mode on, default timezone, no nanosAsLong preset) — so any
query that silently depends on engine session tuning fails here first.

Runs in a SUBPROCESS: inside the pytest process, getOrCreate() would reuse
the engine-configured shared session (not vanilla at all), and stopping it
would kill the SparkContext for every later test.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

_SCRIPT_HEAD = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("entry-contract")
    .config("spark.sql.shuffle.partitions", "8")  # pure speed knob
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

assert len(entrymod.entry(spark).collect()) > 0, "entry() returned no rows"

qs, sql = entrymod.queries(), entrymod.oracle_sql()
assert set(sql) <= set(qs), "oracle_sql keys not a subset of queries"
assert len(qs) >= 50, f"catalog shrank: {len(qs)}"

failures = []
for name, fn in NAMES_STMT:
    try:
        df = fn(spark, SF)
        assert df.count() >= 0
        assert df.columns
    except Exception as e:
        failures.append(f"{name}: {type(e).__name__} {str(e)[:120]}")
assert not failures, "\n".join(failures)
print(f"CONTRACT_OK {len(qs)}")
"""

_SCRIPT_FULL = _SCRIPT_HEAD.replace("NAMES_STMT", "qs.items()")

# The fast default gate drives entry() + the conf-sensitive surfaces on
# the vanilla session (ANSI casts, TIMESTAMP(NANOS) events, streaming
# drain, curate composition, embedding/codec paths); the full 161-query
# sweep (~5 min) runs under the `slow` marker and in every full-suite run.
_SMOKE = (
    "q_gold_agg", "q_agg_pricing", "q_window_events", "q_asof_join",
    "q_stream_tumbling", "q_curate_corpus", "q_dedup_embedding",
    "q_multimodal_features", "q_bow_classifier", "q_heavy_hitters",
)
_SCRIPT_SMOKE = _SCRIPT_HEAD.replace(
    "NAMES_STMT", f"[(n, qs[n]) for n in {_SMOKE!r}]"
)


def _run_contract(script: str) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "CONTRACT_OK" in proc.stdout


def test_driver_contract_smoke_on_vanilla_session():
    _run_contract(_SCRIPT_SMOKE)


@pytest.mark.slow
def test_driver_contract_on_vanilla_session():
    _run_contract(_SCRIPT_FULL)


def test_driver_window_rotation_invariants():
    """The driver's correctness gate reports the first DRIVER_WINDOW
    catalog entries. The rotation contract: the front section is exactly
    DRIVER_WINDOW wide, the tail is exactly the stand-in map's keys
    (demoted entries plus any late-registered debut awaiting next-round
    promotion), and every tail entry's declared same-family stand-ins
    actually sit in the window — so no operator family ever rotates
    fully out of external verification."""
    from inbev_data_engineering_case_spark.queries import (
        CATALOG,
        DRIVER_WINDOW,
        _FAMILY_STAND_INS,
    )

    names = list(CATALOG)
    front = set(names[:DRIVER_WINDOW])
    tail = names[DRIVER_WINDOW:]

    assert len(names) == DRIVER_WINDOW + len(_FAMILY_STAND_INS)
    assert set(tail) == set(_FAMILY_STAND_INS)
    for demoted, stand_ins in _FAMILY_STAND_INS.items():
        assert stand_ins, f"{demoted} declares no stand-ins"
        missing = [s for s in stand_ins if s not in front]
        assert not missing, (
            f"{demoted}'s family stand-ins {missing} are not in the "
            f"first {DRIVER_WINDOW} entries"
        )
