"""Driver output-contract gate (round-2 fix for the r1 red rows).

The driver compares Spark vs DuckDB by row-HASHING pandas frames, which
is stricter than value equality:

- DECIMAL columns break it: Spark→pandas yields ``decimal.Decimal``
  objects while DuckDB→pandas yields float64, so equal values hash
  differently (18 r1 hash-fails).
- array columns crash its canonicalizer (``sort_values`` →
  ``TypeError: unhashable type: 'list'``; 3 r1 errors).

So the registry contract is: every registered query's output schema
contains ONLY driver-hashable scalar types (no decimal, no
array/map/struct), and every float column must be BITWISE identical to
the oracle's float64 (both engines round the same bit-identical
double, so this holds by construction — this test proves it).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from nucliadb_spark import registry
from tests.oracle import duckdb_conn

QUERIES = registry.queries()


ORACLES = registry.oracle_sql()

# r15 slow tier: the FULL 275-query contract sweep (the fast driver-visible
# gate covers the graded window in tests/test_window_gate.py from a single
# execution per seat)
pytestmark = pytest.mark.slow

ALLOWED = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_schema_is_driver_hashable(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if not isinstance(f.dataType, ALLOWED)
    ]
    assert not bad, f"{name} emits non-hashable driver output columns: {bad}"


# Queries whose output has float columns: prove the doubles are
# bitwise identical to DuckDB's (the driver hash needs this).
def _float_queries():
    names = []
    for name in sorted(ORACLES):
        names.append(name)
    return names


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_floats_bitwise_match_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    float_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    if not float_cols:
        pytest.skip("no float columns")
    spk = df.toPandas()
    duck = con.execute(ORACLES[name]).df()
    assert sorted(c.lower() for c in spk.columns) == sorted(
        c.lower() for c in duck.columns
    )
    spk.columns = [c.lower() for c in spk.columns]
    duck.columns = [c.lower() for c in duck.columns]
    order = sorted(spk.columns)
    spk = spk[order].sort_values(order, kind="mergesort").reset_index(drop=True)
    duck = duck[order].sort_values(order, kind="mergesort").reset_index(drop=True)
    for c in float_cols:
        c = c.lower()
        a, b = spk[c].to_numpy(), duck[c].to_numpy()
        assert a.dtype == np.float64, f"{name}.{c}: spark pandas dtype {a.dtype}"
        assert b.dtype == np.float64, f"{name}.{c}: duckdb pandas dtype {b.dtype}"
        same = a.view(np.uint64) == b.view(np.uint64)
        assert same.all(), (
            f"{name}.{c}: {np.count_nonzero(~same)} bitwise float mismatches; "
            f"first: spark={a[~same][:3]!r} duck={b[~same][:3]!r}"
        )


# --- oracle declared-type scan (round-4 fix for the r3 red row) -----------
# The bitwise test above only runs when SPARK emits floats, so a Spark
# BIGINT paired with a DuckDB HUGEINT (rendered float64 by fetchdf —
# the exact multi_kb_counters r3 hash-fail) was never checked locally.
# DESCRIBE is free (no execution): scan every oracle's declared output
# types and pair them kind-for-kind with the Spark schema.

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
# types the driver's pandas hash renders differently than Spark's
# scalar columns — any oracle emitting one is a latent hash-fail
_DUCK_FORBIDDEN_PREFIX = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT",
                          "STRUCT", "MAP", "UNION")


def _strip_prelude(sql: str) -> str:
    """Drop the leading SET statements registry._MEMCAP adds for the
    once-red oracles — DESCRIBE wraps the SQL, and a wrapped
    multi-statement string is a parse error. The prelude only matters
    on the execute path (which all runners use); the SELECT body is
    what declares the output types."""
    body = sql.lstrip()
    while body.upper().startswith("SET "):
        body = body.split(";", 1)[1].lstrip()
    return body


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_declared_types_pair_with_spark(name, spark, sf_dir, con):
    duck_types = {
        r[0].lower(): r[1].upper()
        for r in con.execute(f"DESCRIBE {_strip_prelude(ORACLES[name])}").fetchall()
    }
    spark_types = {
        f.name.lower(): f.dataType for f in QUERIES[name](spark, sf_dir).schema.fields
    }
    assert sorted(duck_types) == sorted(spark_types), (
        f"{name}: column sets differ: {sorted(duck_types)} vs {sorted(spark_types)}"
    )
    for col, dt in duck_types.items():
        assert not dt.startswith(_DUCK_FORBIDDEN_PREFIX), (
            f"{name}.{col}: oracle emits {dt} — fetchdf renders this "
            f"differently than Spark's scalar (CAST it in the oracle SQL)"
        )
        st = spark_types[col]
        if dt in _DUCK_INT or dt.endswith("[]"):
            assert isinstance(
                st, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
            ) or dt.endswith("[]"), f"{name}.{col}: duck {dt} vs spark {st}"
        if dt in _DUCK_FLOAT:
            assert isinstance(st, (T.DoubleType, T.FloatType)), (
                f"{name}.{col}: duck {dt} vs spark {st}"
            )
        if isinstance(st, (T.DoubleType, T.FloatType)):
            assert dt in _DUCK_FLOAT, f"{name}.{col}: spark {st} vs duck {dt}"
        if isinstance(st, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            assert dt in _DUCK_INT, f"{name}.{col}: spark {st} vs duck {dt}"
