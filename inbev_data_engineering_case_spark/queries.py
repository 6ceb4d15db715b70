"""Query catalog: every implemented operator from SURVEY.md §2 (and the §7
extensions) as a named query over the synthetic tables, paired with its
ANSI-SQL DuckDB oracle.

Contract (driver's __spark_entry__):
- each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle SQL runs on DuckDB views named after the parquet tables;
- column names are aliased identically on both sides (the driver sorts
  columns by name before value-hashing);
- float-valued results are made engine-stable: money aggregates via exact
  decimal sums surfaced as double (functions.dsum/davg), similarity scores
  rounded.

The catalog is data: ``CATALOG[name] = QuerySpec(fn, oracle, headline)``.
``headline=True`` marks the queries bench.py times at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.functions import (
    disc_price,
    dsum,
    xsum,
)
from inbev_data_engineering_case_spark.operators import windows as W
from inbev_data_engineering_case_spark.operators.aggregate import (
    grouped_stats,
    pricing_summary,
)
from inbev_data_engineering_case_spark.operators.joins import (
    anti_join,
    semi_join,
)
from inbev_data_engineering_case_spark.operators.normalize import (
    MOJIBAKE_RULES,
    accent_fold_sql_literals,
    clean_text,
    normalize_location,
    repair_mojibake,
)
from inbev_data_engineering_case_spark.sources.readers import (
    read_events,
    read_parquet_table,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None → genuinely non-SQL-expressible (rows-only check)
    headline: bool = False
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, headline: bool = False, doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference surface (SURVEY.md §2.1-2.4)
# ---------------------------------------------------------------------------

@register(
    "q_gold_agg",
    """
    SELECT c_mktsegment,
           replace(lower(trim(n_name)), ' ', '-') AS nation,
           count(*) AS customer_count
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
    """,
    headline=True,
    doc="Flagship: the reference's gold aggregation (OP-17, "
    "gold_data_aggregation.py:50) on the star schema — normalize a location "
    "key, group by (category, location), count. Dimension join broadcasts.",
)
def q_gold_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    )
    return (
        joined.select(
            "c_mktsegment", normalize_location("n_name").alias("nation")
        )
        .groupBy("c_mktsegment", "nation")
        .agg(F.count("*").alias("customer_count"))
    )


@register(
    "q_project",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    doc="OP-10 column projection: 3 of 5 customer columns; pruning reaches "
    "the parquet scan (ReadSchema shows only these fields).",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_filter_predicate",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
    """,
    doc="Row predicates (absent in reference, SURVEY.md §2.2) — both "
    "conjuncts reach the scan as PushedFilters.",
)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@register(
    "q_normalize_location",
    """
    SELECT n_nationkey,
           replace(lower(trim('  ' || n_name || ' X Y  ')), ' ', '-')
             AS n_name_norm
    FROM nation
    """,
    doc="OP-11/OP-16: trim → lower → spaces-to-dashes "
    "(data_transformations_bronze_to_silver.py:94-96), exercised on a "
    "synthetically messied key (padding + internal spaces).",
)
def q_normalize_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    messy = F.concat(F.lit("  "), F.col("n_name"), F.lit(" X Y  "))
    return _t(spark, sf_dir, "nation").select(
        "n_nationkey", normalize_location(messy).alias("n_name_norm")
    )


def _mojibake_oracle() -> str:
    expr = "'k�rnten nieder�sterreich Caf� ' || n_name"
    for col_rules in MOJIBAKE_RULES.values():
        for pat, repl in col_rules:
            p = pat.replace("'", "''")
            r = repl.replace("'", "''")
            expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"SELECT n_nationkey, {expr} AS repaired FROM nation"


@register(
    "q_mojibake_repair",
    _mojibake_oracle(),
    doc="OP-12: ordered rule-table regexp repair generalizing the "
    "reference's seven hard-coded U+FFFD fixes "
    "(data_transformations_bronze_to_silver.py:98-105), exercised on input "
    "seeded with the actual mojibake literals.",
)
def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    messy = F.concat(
        F.lit("k�rnten nieder�sterreich Caf� "), F.col("n_name")
    )
    out = messy
    for col_rules in MOJIBAKE_RULES.values():
        out = repair_mojibake(out, col_rules)
    return _t(spark, sf_dir, "nation").select(
        "n_nationkey", out.alias("repaired")
    )


def _clean_text_oracle() -> str:
    matching, replace = accent_fold_sql_literals()
    return f"""
    SELECT n_nationkey,
           translate(
             regexp_replace('Kärnten_Über ' || n_name, '\\p{{Pc}}', '', 'g'),
             '{matching}', '{replace}'
           ) AS cleaned
    FROM nation
    """


@register(
    "q_clean_text",
    _clean_text_oracle(),
    doc="OP-13/OP-14: strip connector punctuation then fold accents via the "
    "precomputed translate table (data_transformations_bronze_to_silver.py:"
    "26-47). The oracle embeds the identical table, so parity is by "
    "construction; table computed once per process (fixes SURVEY.md §4.3-1).",
)
def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    messy = F.concat(F.lit("Kärnten_Über "), F.col("n_name"))
    return _t(spark, sf_dir, "nation").select(
        "n_nationkey", clean_text(messy).alias("cleaned")
    )


# ---------------------------------------------------------------------------
# Aggregation extensions
# ---------------------------------------------------------------------------

# Exact decimal arithmetic mirroring functions.disc_price/charge: inputs cast
# to decimal BEFORE multiplying so products are exact on both engines (casting
# a computed double to decimal rounds shortest-repr/HALF_UP in Spark vs exact
# binary value in DuckDB — they disagree).
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)
_CHARGE = f"{_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(18,2)))"

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
       sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
       sum({_DISC_PRICE})::DOUBLE AS sum_disc_price,
       sum({_CHARGE})::DOUBLE AS sum_charge,
       round(sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / count(l_quantity), 6)
         AS avg_qty,
       round(sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE
             / count(l_extendedprice), 6) AS avg_price,
       round(sum(CAST(l_discount AS DECIMAL(18,2)))::DOUBLE / count(l_discount), 6)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q_agg_pricing",
    _Q1_ORACLE,
    headline=True,
    doc="TPC-H Q1-shaped pricing summary: the canonical full-scan aggregate. "
    "Money sums exact via decimal; one shuffle over a 4-key space.",
)
def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(_t(spark, sf_dir, "lineitem"), "1998-09-02 00:00:00")


@register(
    "q_group_stats",
    """
    SELECT p_brand,
           count(*) AS price_count,
           min(p_retailprice) AS price_min,
           max(p_retailprice) AS price_max,
           sum(CAST(p_retailprice AS DECIMAL(18,2)))::DOUBLE AS price_sum,
           round(sum(CAST(p_retailprice AS DECIMAL(18,2)))::DOUBLE
                 / count(p_retailprice), 6) AS price_avg
    FROM part GROUP BY p_brand
    """,
    doc="min/max/sum/avg/count bundle per key (SURVEY.md §2.6 'absent' "
    "aggregates, added).",
)
def q_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return grouped_stats(_t(spark, sf_dir, "part"), ["p_brand"], "p_retailprice", "price")


@register(
    "q_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="distinct over a low-cardinality pair — partial aggregation makes "
    "the shuffle carry only unique values per map task.",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@register(
    "q_join_orders",
    f"""
    SELECT l_orderkey,
           sum({_DISC_PRICE})::DOUBLE AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    doc="TPC-H Q3-shaped: selective dim filter → fact join → top-10 by "
    "revenue. customer side broadcasts after the segment filter; orderBy+"
    "limit plans as TakeOrderedAndProject (no global sort).",
)
def q_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(xsum(disc_price(), "revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_join_star",
    f"""
    SELECT n_name,
           sum({_DISC_PRICE})::DOUBLE AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
    GROUP BY n_name
    """,
    headline=True,
    doc="TPC-H Q5-shaped six-table star join: fact-fact shuffle join on "
    "orderkey, all dims broadcast; region filter prunes before joining.",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(supplier),
            (lineitem["l_suppkey"] == supplier["s_suppkey"])
            & (customer["c_nationkey"] == supplier["s_nationkey"]),
        )
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(xsum(disc_price(), "revenue"))
    )


@register(
    "q_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-semi join (EXISTS): right side never materializes columns.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(customer, orders, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "q_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-anti join (NOT EXISTS).",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti_join(customer, orders, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "q_set_ops",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="set ops (union-distinct); unionByName + distinct.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# Sorts / limits / windows
# ---------------------------------------------------------------------------

@register(
    "q_orderby_limit",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
    doc="top-k: TakeOrderedAndProject — per-partition heap + driver merge, "
    "no global sort. Deterministic via the custkey tiebreak.",
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(10)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "q_window_topk",
    """
    WITH counts AS (
      SELECT c_mktsegment, n_name, count(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT c_mktsegment, n_name, n_customers,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY n_customers DESC, n_name) AS rank
      FROM counts
    ) WHERE rank <= 3
    """,
    doc="ranking window: top-3 nations per market segment by customer count "
    "(the 'top brewery type per country' gold view analog, SURVEY.md §2.6).",
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    counts = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )
    return W.top_k_per_group(
        counts,
        ["c_mktsegment"],
        [F.col("n_customers").desc(), F.col("n_name")],
        k=3,
    )


@register(
    "q_running_total",
    """
    SELECT o_orderkey,
           sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING)::DOUBLE AS running_total
    FROM orders WHERE o_custkey < 100
    """,
    doc="cumulative-sum window frame; decimal accumulation keeps the "
    "running values exact and order-stable.",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from inbev_data_engineering_case_spark.functions import money

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            F.sum(money("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time / JSON / date functions (events table)
# ---------------------------------------------------------------------------

@register(
    "q_window_events",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total_value
    FROM events GROUP BY 1, 2
    """,
    headline=True,
    doc="batch tumbling window (1h) per event type — streaming twin in "
    "streaming/events.py uses the same aggregation with a watermark.",
)
def q_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_window_agg(
        read_events(spark, sf_dir),
        "ts",
        "hour",
        ["event_type"],
        [F.count("*").alias("n_events"), dsum("value", "total_value")],
    )


@register(
    "q_json_extract",
    """
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="JSON scalar extraction from the props column (get_json_object), "
    "aggregated per event type.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_events(spark, sf_dir)
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "q_date_functions",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           count(*) AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total_price
    FROM orders GROUP BY 1, 2
    """,
    doc="date/time scalar functions (year/month) feeding an aggregate.",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )
