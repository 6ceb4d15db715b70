"""Data-quality profiling: declarative rule checks evaluated in ONE pass.

The reference's only data-quality machinery is the ingestion page-count
invariant (reference README.md:84, covered by ``sources/rest.py``) and the
EDA findings hard-coded into the cleansing rules (SURVEY.md §5.1). This
operator generalizes both: a rule set is profiled over any table as a
single aggregation — each rule contributes ``sum(violated ? 1 : 0)`` — so
profiling 100 TB costs one scan + one scalar row, not one scan per rule.

Rules are (name, Column predicate that is TRUE when the row VIOLATES the
rule). Output is long-form (rule, n_violations, n_rows) so downstream
gating (`fail if any n_violations > 0`) and dashboards need no schema
changes when rules are added.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_profile(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Profile violation counts for every rule in one aggregation pass.

    ``rules``: list of (rule_name, violation_predicate). The wide
    single-row aggregate is unpivoted to (rule, n_violations, n_rows) rows
    via a stack expression — still a single job, no shuffle beyond the
    global aggregate.
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{name}', __v{i}" for i, (name, _) in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_expr}) AS (rule, n_violations)",
        "__n AS n_rows",
    ).select("rule", "n_violations", "n_rows")
