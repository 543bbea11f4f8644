"""FAST-TIER driver gate: the graded window, one execution per query.

The driver grades `registry.PRIORITY[:50]` each round (rows + schema
+ hash vs the DuckDB oracle). The full-sweep mirrors of that gate
(test_driver_contract.py, test_oracle_parity.py — all 275 queries ×
4 separate executions) are the slow tier since r15: the r14 driver
TIMED OUT running them, which protects nothing. This module is the
driver-visible replacement: for every window seat it runs the query
ONCE and checks, from that single execution,

- column names + row counts + order-insensitive values vs the oracle
  (strictly stronger than the driver's hash),
- bitwise float64 equality per float column (what the hash needs),
- driver-hashable output schema (scalar types only),
- oracle declared types pair kind-for-kind with the Spark schema
  (DESCRIBE — free, catches the HUGEINT/DECIMAL hash-fail class).

Everything here re-runs for all 275 queries in the slow tier.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import types as T

from nucliadb_spark import registry
from tests.oracle import canon_rows, duckdb_conn
from tests.test_driver_contract import (
    ALLOWED,
    _DUCK_FLOAT,
    _DUCK_FORBIDDEN_PREFIX,
    _DUCK_INT,
    _strip_prelude,
)

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()
WINDOW = registry.PRIORITY[:50]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def _bits(v):
    return struct.pack("<d", v) if isinstance(v, float) else v


@pytest.mark.parametrize("name", [n for n in WINDOW if n in ORACLES])
def test_window_seat(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)

    # 1. driver-hashable schema (no execution needed)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, ALLOWED)
    ]
    assert not bad, f"{name} emits non-hashable driver output columns: {bad}"

    # 2. oracle declared types pair kind-for-kind (DESCRIBE is free)
    duck_types = {
        r[0].lower(): r[1].upper()
        for r in con.execute(
            f"DESCRIBE {_strip_prelude(ORACLES[name])}"
        ).fetchall()
    }
    spark_types = {f.name.lower(): f.dataType for f in df.schema.fields}
    assert set(duck_types) == set(spark_types), name
    for col, dt in duck_types.items():
        assert not dt.startswith(_DUCK_FORBIDDEN_PREFIX), (
            f"{name}.{col}: oracle declares {dt} (driver hash hazard)"
        )
        st = spark_types[col]
        if dt in _DUCK_FLOAT:
            assert isinstance(st, (T.DoubleType, T.FloatType)), (name, col, dt, st)
        elif dt in _DUCK_INT:
            assert isinstance(
                st, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
            ), (name, col, dt, st)

    # 3. ONE execution each side: values + row counts + columns
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = [c.lower() for c in df.columns]
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s, d = canon_rows(spark_rows), canon_rows(duck_rows)
    assert s == d, f"{name}: value mismatch (first diff: " + next(
        (f"{a} != {b}" for a, b in zip(s, d) if a != b), "row set"
    ) + ")"

    # 4. float columns bitwise identical (pair rows by the canonical
    # sort that step 3 just proved equal; every query rounds its
    # floats, so canonically-equal cells are the same double)
    float_idx = [
        i
        for i, f in enumerate(df.schema.fields)
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    if float_idx:
        sp = sorted(spark_rows, key=lambda r: tuple(map(_key, r)))
        du = sorted(duck_rows, key=lambda r: tuple(map(_key, r)))
        for a, b in zip(sp, du):
            for i in float_idx:
                av, bv = a[i], b[i]
                if av is None and bv is None:
                    continue
                assert _bits(av) == _bits(bv), (
                    f"{name} col#{i}: bitwise float mismatch {av!r} != {bv!r}"
                )


def _key(v):
    from tests.oracle import _canon

    c = _canon(v)
    return (c is None, str(type(c)), str(c))


@pytest.mark.parametrize("name", [n for n in WINDOW if n not in ORACLES])
def test_window_seat_rows_only(name, spark, sf_dir):
    assert QUERIES[name](spark, sf_dir).count() >= 0
