"""Shared helpers replicating the driver's oracle-comparison semantics:
order-insensitive value hash over name-sorted columns. Used by
tools/check_oracle.py and the pytest suite.

The comparison is STRICT by default (exact float repr, no tolerance, plus
an Arrow-level type-family check on the oracle result). Round 1 taught why:
a tolerant local gate (1e-9 rounding, whole-float→int collapsing)
green-lit three queries the driver's hasher rejected — DuckDB ``sum()``
returns HUGEINT (int128), which surfaces as float64/decimal128 through
pandas/Arrow while Spark returns int64. The type-family check catches that
class even when the Python ``fetchall()`` values happen to coincide.
"""

from __future__ import annotations

import hashlib
import math

STAR_TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(v: object, tolerant: bool = False) -> str:
    """Canonical string for a cell value.

    Strict (default): full-precision ``repr`` for floats — any cross-engine
    bit difference shows. ``tolerant=True`` restores the round-1 behavior
    (1e-9 rounding, whole floats collapsed to ints) for diagnosing whether
    a mismatch is representation-only.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if tolerant:
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(round(v, 9))
        return repr(v)
    return str(v)


def table_hash(
    cols: list[str], rows: list[tuple], tolerant: bool = False
) -> tuple[int, str]:
    """(row_count, md5) with columns sorted by name, rows sorted as strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon(row[i], tolerant) for i in order) for row in rows
    )
    digest = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), digest


def duckdb_star_connection(sf_dir: str):
    """DuckDB connection with the synthetic tables registered as views,
    mirroring the driver's oracle environment."""
    import duckdb

    con = duckdb.connect()
    for t in STAR_TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _spark_type_family(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s == "boolean":
        return "bool"
    if s == "string":
        return "string"
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "date":
        return "date"
    return f"other:{s}"


def _arrow_type_family(t) -> str:
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_decimal(t):
        # DuckDB HUGEINT / DECIMAL exports as decimal128 — lands as
        # float64 through pandas, diverging from Spark's int64/double
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    return f"other:{t}"


def oracle_type_mismatches(sdf_schema, arrow_schema) -> list[str]:
    """Column-level type-family differences between a Spark result schema
    and the oracle's Arrow schema. A DuckDB HUGEINT next to a Spark bigint
    is exactly the divergence the driver's hasher rejects."""
    spark_fams = {f.name: _spark_type_family(f.dataType) for f in sdf_schema}
    msgs = []
    for field in arrow_schema:
        sf = spark_fams.get(field.name)
        of = _arrow_type_family(field.type)
        if sf is None:
            continue
        if sf.startswith("other") or of.startswith("other"):
            continue  # nested types: value compare still applies
        if sf != of:
            msgs.append(
                f"type family differs on '{field.name}': spark={sf} "
                f"oracle={of} (arrow {field.type}) — cast in the oracle SQL"
            )
    return msgs


def compare_query(
    spec, spark, con, sf_dir: str, tolerant: bool = False
) -> str | None:
    """Run one QuerySpec both ways; return None on match, else a message."""
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return None
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return f"columns differ: {sorted(scols)} vs {sorted(ocols)}"
    if not tolerant:
        type_msgs = oracle_type_mismatches(
            sdf.schema, con.execute(spec.oracle).arrow().schema
        )
        if type_msgs:
            return "; ".join(type_msgs)
    sn, sh = table_hash(scols, srows, tolerant)
    on, oh = table_hash(ocols, orows, tolerant)
    if sn != on:
        return f"row count differs: {sn} vs {on}"
    if sh != oh:
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        sl = sorted(
            "\x1f".join(canon(r[i], tolerant) for i in order) for r in srows
        )
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        ol = sorted(
            "\x1f".join(canon(r[i], tolerant) for i in oorder) for r in orows
        )
        for a, b in zip(sl, ol):
            if a != b:
                return f"value mismatch:\n  spark:  {a[:200]}\n  oracle: {b[:200]}"
        return "value hash mismatch"
    return None
