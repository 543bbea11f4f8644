"""URL filtering ops (operators/urls.py): normalization edge cases,
banned-word scoring kinds, blocklist filtering, dedup survivor
determinism — plus Spark/DuckDB expression agreement on the edge
cases (the registry corpus only exercises the happy paths)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import urls

EDGE_URLS = [
    # (raw, normalized, host)
    ("http://Example.COM/path", "http://example.com/path", "example.com"),
    ("HTTPS://a.b.c:443/x/", "https://a.b.c/x", "a.b.c"),
    ("http://h.io:80/", "http://h.io", "h.io"),
    ("http://h.io:8080/x", "http://h.io:8080/x", "h.io"),
    ("http://h.io/x#frag", "http://h.io/x", "h.io"),
    ("http://h.io/x?q=1#frag", "http://h.io/x?q=1", "h.io"),
    ("http://h.io/x?q=1", "http://h.io/x?q=1", "h.io"),
    ("ftp://files.org", "ftp://files.org", "files.org"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(EDGE_URLS)], "rid long, uri string"
    )


def test_url_normalize_edge_cases(spark, edge_df):
    got = edge_df.select("rid", urls.url_normalize("uri").alias("n")).collect()
    for r in got:
        assert r.n == EDGE_URLS[r.rid][1], EDGE_URLS[r.rid][0]


def test_url_host_edge_cases(spark, edge_df):
    got = edge_df.select("rid", urls.url_host("uri").alias("h")).collect()
    for r in got:
        assert r.h == EDGE_URLS[r.rid][2], EDGE_URLS[r.rid][0]


def test_sql_twins_agree_on_edge_cases(spark, edge_df):
    """The DuckDB expressions must produce byte-identical results on
    the edge cases, not just on the synthetic corpus."""
    con = duckdb.connect()
    for raw, want_norm, want_host in EDGE_URLS:
        lit = "'" + raw.replace("'", "''") + "'"
        n, h, s = con.execute(
            f"SELECT {urls.url_normalize_sql(lit)},"
            f" {urls.url_host_sql(lit)},"
            f" {urls.url_banned_score_sql(lit)}"
        ).fetchone()
        assert n == want_norm
        assert h == want_host
        srow = (
            spark.range(1)
            .select(
                urls.url_normalize(F.lit(raw)).alias("n"),
                urls.url_host(F.lit(raw)).alias("h"),
                urls.url_banned_score(F.lit(raw)).alias("s"),
            )
            .first()
        )
        assert srow.n == n and srow.h == h and float(srow.s) == float(s)


BANNED_CASES = [
    ("http://casino.example.com/x", 1.0),  # host token
    ("http://sub.casino.org/x", 1.0),  # inner host token
    ("http://supercasino.com/x", 0.5),  # substring of host, not a token
    ("http://ok.com/casino/slots", 0.5),  # path substring
    ("http://ok.com/viagra?xxx=1", 1.0),  # two words, capped at 1
    ("http://clean.example/x", 0.0),
]


def test_banned_score_kinds(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in BANNED_CASES], "uri string"
    ).select("uri", urls.url_banned_score("uri").alias("s"))
    got = {r.uri: r.s for r in df.collect()}
    for u, want in BANNED_CASES:
        assert got[u] == pytest.approx(want), u


def test_url_filter_blocklist_and_score(spark):
    rows = [
        (1, "http://good.example/a"),
        (2, "http://blocked.example/a"),
        (3, "http://good.example/casino/a"),  # score 0.5, cut
        (4, "http://casino.example/a"),  # score 1.0, cut
    ]
    df = spark.createDataFrame(rows, "rid long, uri string")
    kept = urls.url_filter(df, blocklist=["Blocked.example"], max_score=0.5)
    assert [r.rid for r in kept.collect()] == [1]
    # filter must not leave helper columns behind
    assert set(kept.columns) == {"rid", "uri"}


def test_url_dedup_survivor_deterministic(spark):
    rows = [
        (10, "http://H.io:80/x/#a"),
        (20, "http://h.io/x"),
        (30, "https://other.io/y"),
    ]
    df = spark.createDataFrame(rows, "rid long, uri string")
    out = {r.url_norm: r for r in urls.url_dedup(df).collect()}
    assert out["http://h.io/x"].n_dups == 1
    assert out["http://h.io/x"].survivor_id in (10, 20)
    assert out["https://other.io/y"].n_dups == 0
    # deterministic across runs
    again = {r.url_norm: r.survivor_id for r in urls.url_dedup(df).collect()}
    assert again["http://h.io/x"] == out["http://h.io/x"].survivor_id


def test_url_banned_score_metachar_words(spark):
    """Banned words containing regex metacharacters ('c++', 'a.b')
    must match literally in BOTH engines — unescaped they change
    semantics ('a.b' matching 'aXb') or raise a pattern error."""
    import duckdb

    rows = [
        ("http://c++.example/x", "c++", 1.0),   # host token, literal
        ("http://ok.example/see-c++", "c++", 0.5),  # path substring
        ("http://axb.example/", "a.b", 0.0),    # '.' must NOT be a wildcard
        ("http://a.b.example/", "a.b", 1.0),    # real dotted host token
    ]
    df = spark.createDataFrame(
        [(u, w) for u, w, _ in rows], "uri string, w string"
    )
    con = duckdb.connect()
    for uri, word, want in rows:
        got = (
            spark.range(1)
            .select(urls.url_banned_score(F.lit(uri), [word]).alias("s"))
            .collect()[0]
            .s
        )
        assert got == want, (uri, word, got)
        lit = "'" + uri + "'"
        (ds,) = con.execute(
            f"SELECT {urls.url_banned_score_sql(lit, [word])}"
        ).fetchone()
        assert float(ds) == want, (uri, word, ds)
