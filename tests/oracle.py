"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables and asserts row-count + column-name + order-insensitive value
equality (the driver hashes; we compare values directly which is
strictly stronger).
"""

from __future__ import annotations

import datetime
import math

import duckdb

TABLES = [
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


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # each duckdb.connect() is an independent instance whose default
    # memory_limit is ~80% of PHYSICAL RAM — several instances plus
    # the 24g Spark JVM can together outrun the box and die with a
    # "Failed to allocate block" bad_alloc even though every oracle
    # here is tiny (seen on the r9 grading box and locally in r10).
    # Bound the oracle explicitly: sf0.01 oracles need well under 8GB.
    con.execute("SET memory_limit='8GB'")
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries are expected to round; canonicalize residual repr noise
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def canon_rows(rows) -> list[tuple]:
    return sorted(tuple(_canon(v) for v in row) for row in rows)


def compare(spark_df, con, sql: str, name: str = "query") -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = [c.lower() for c in spark_df.columns]
    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s, d = canon_rows(spark_rows), canon_rows(duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
