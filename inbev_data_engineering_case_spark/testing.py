"""Shared helpers replicating the driver's oracle-comparison semantics:
order-insensitive value hash over name-sorted columns. Used by
tools/check_oracle.py and the pytest suite."""

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


def canon(v: object) -> str:
    """Canonical string for a cell value, tolerant of float noise below 1e-9."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    """(row_count, md5) with columns sorted by name, rows sorted as strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(row[i]) for i in order) for row in rows)
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


def compare_query(spec, spark, con, sf_dir: str) -> str | None:
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
    sn, sh = table_hash(scols, srows)
    on, oh = table_hash(ocols, orows)
    if sn != on:
        return f"row count differs: {sn} vs {on}"
    if sh != oh:
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        sl = sorted("\x1f".join(canon(r[i]) for i in order) for r in srows)
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        ol = sorted("\x1f".join(canon(r[i]) for i in oorder) for r in orows)
        for a, b in zip(sl, ol):
            if a != b:
                return f"value mismatch:\n  spark:  {a[:200]}\n  oracle: {b[:200]}"
        return "value hash mismatch"
    return None
