"""Local replica of the driver's correctness comparison.

Runs a Spark query and its DuckDB oracle side-by-side, compares
row count, column-name set, and an order-insensitive value hash with
doubles rounded to 2 decimals (per FIXTURES.md hashing rules).
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

import duckdb

TABLE_NAMES = (
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
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 4 decimals, stricter than FIXTURES.md's 2: the round-3 driver
        # caught a 4th-decimal rounding-convention mismatch the 2-decimal
        # local hash masked (VERDICT r3 #1) — never let that hide again.
        r = round(v, 4)
        return "0.0" if r == 0 else f"{r:.4f}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    serialized = sorted("\x01".join(_norm(row[i]) for i in order) for row in rows)
    digest = hashlib.sha256("\n".join(serialized).encode()).hexdigest()
    return len(rows), cols, digest


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sn, sc, sh = canonicalize(s_cols, s_rows)
    dn, dc, dh = canonicalize(d_cols, d_rows)
    return {
        "rows_match": sn == dn,
        "cols_match": sc == dc,
        "hash_match": sh == dh,
        "spark": (sn, sc, sh),
        "duckdb": (dn, dc, dh),
    }
