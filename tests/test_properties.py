"""Property-based parity for the shared function contracts
(SURVEY §5 test-strategy parity: the reference fuzzes its tokenizer /
schema round-trips; here hypothesis drives the three-way contract
Spark == DuckDB == python over the ASCII domain the fixtures use).

Each property batches all generated examples into ONE Spark job and
ONE DuckDB query — per-example jobs would be 100× slower.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from nucliadb_spark.functions import text as T

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


def _spark_eval(spark, rows, colfn, out="out"):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], "i long, s string")
    return [
        r[out]
        for r in df.select("i", colfn("s").alias(out)).orderBy("i").collect()
    ]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@settings(max_examples=20, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=25))
def test_tokenizer_three_way(spark, con, texts):
    py = [T.tokenize_py(s) for s in texts]
    sp = _spark_eval(spark, texts, T.tokenize)
    dk = [
        con.execute(f"SELECT {T.tokenize_sql('?')}", [s]).fetchone()[0] or []
        for s in texts
    ]
    assert sp == py == dk


@settings(max_examples=20, deadline=None)
@given(st.lists(ASCII.filter(bool), min_size=1, max_size=25))
def test_md5_int60_three_way(spark, con, texts):
    py = [int(hashlib.md5(("x:" + s).encode()).hexdigest()[:15], 16) for s in texts]
    sp = _spark_eval(spark, texts, lambda c: T.md5_int60(__import__("pyspark.sql.functions", fromlist=["x"]).col(c), salt="x:"))
    con.execute("CREATE OR REPLACE TABLE h (i INT, s VARCHAR)")
    for i, s in enumerate(texts):
        con.execute("INSERT INTO h VALUES (?, ?)", [i, s])
    dk = [
        row[0]
        for row in con.execute(
            f"SELECT {T.md5_int60_sql('s', salt='x:')} FROM h ORDER BY i"
        ).fetchall()
    ]
    assert sp == py == dk


@settings(max_examples=15, deadline=None)
@given(st.lists(ASCII, min_size=1, max_size=15))
def test_fingerprint_order_insensitive(spark, texts):
    """token_set_fingerprint is a bag-of-distinct-words canonical
    form: permuting and duplicating words must not change it."""
    from nucliadb_spark.operators.dedup import token_set_fingerprint

    perms = [" ".join(reversed(T.tokenize_py(s)) ) + " " + s for s in texts]
    a = _spark_eval(spark, texts, lambda c: token_set_fingerprint(c))
    b = _spark_eval(spark, perms, lambda c: token_set_fingerprint(c))
    assert a == b
