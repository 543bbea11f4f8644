"""URL filtering for training-data curation (RefinedWeb §3.1 /
FineWeb URL-filtering stage): normalization, host extraction,
blocklist filtering, a soft banned-word URL score, and exact
URL-level deduplication.

The reference ingests link fields whose CloudFile/FieldLink carry a
`uri` (resources.proto link fields); a pretraining pipeline built on
this engine filters fetched pages by their URL before any content
processing, because URL checks are free relative to text analysis.

Plan shapes (the point at 100 TB):
- normalize/host/score are ROW-LOCAL string expressions inside
  whole-stage codegen — the filter is a scan-time predicate, zero
  shuffles, and Catalyst pushes the surviving-row projection down.
- the blocklist is a tiny dimension — broadcast anti-join, never a
  shuffle of the corpus.
- URL dedup groups by the normalized URL (one url-keyed shuffle) and
  elects the md5-min survivor, the same deterministic-survivor rule
  as dedup.py's cluster election; ingestion order never biases who
  survives.

All expressions have DuckDB twins built from the same regexes, so
every op is oracle-checkable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from nucliadb_spark.functions.text import md5_int60, md5_int60_sql
from nucliadb_spark.operators.filters import _sql_quote

# scheme://host[:port]/path — capture groups shared by both engines
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

# RefinedWeb-style soft scoring: a URL containing a banned word
# scores by the severity of the match kind (exact token in host >
# substring anywhere). Words here are placeholders for the curated
# list the paper uses.
DEFAULT_BANNED_WORDS = ["casino", "viagra", "warez", "xxx"]


def url_host(url: Column | str) -> Column:
    """Lowercased host (authority minus port/userinfo)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def url_host_sql(url: str) -> str:
    return f"lower(coalesce(regexp_extract({url}, '{_HOST_RE}', 1), ''))"


def url_normalize(url: Column | str) -> Column:
    """Canonical form for exact URL dedup: lowercase scheme+host,
    strip the fragment, strip a trailing slash on the path, drop
    the default ports :80/:443. Query strings are kept — two URLs
    differing in query are different fetches."""
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(c, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    host_port = F.regexp_extract(rest, "^([^/?#]+)", 1)
    tail = F.substring(rest, F.length(host_port) + 1, F.lit(1 << 20))
    host_norm = F.regexp_replace(F.lower(host_port), ":(80|443)$", "")
    tail_norm = F.regexp_replace(tail, "/$", "")
    return F.concat(scheme, F.lit("://"), host_norm, tail_norm)


def url_normalize_sql(url: str) -> str:
    no_frag = f"regexp_replace({url}, '#.*$', '')"
    scheme = f"lower(coalesce(regexp_extract({no_frag}, '{_SCHEME_RE}', 1), ''))"
    rest = f"regexp_replace({no_frag}, '{_SCHEME_RE}', '')"
    host_port = f"coalesce(regexp_extract({rest}, '^([^/?#]+)', 1), '')"
    tail = f"substring({rest}, length({host_port}) + 1)"
    host_norm = f"regexp_replace(lower({host_port}), ':(80|443)$', '')"
    tail_norm = f"regexp_replace({tail}, '/$', '')"
    return f"concat({scheme}, '://', {host_norm}, {tail_norm})"


def url_banned_score(url: Column | str, words: list[str] | None = None) -> Column:
    """Soft score in [0, 1]: 0 = clean. Each banned word contributes
    1.0 if it is a dot-separated token of the host, 0.5 if it appears
    anywhere else in the URL; the sum is capped at 1."""
    words = words or DEFAULT_BANNED_WORDS
    c = F.col(url) if isinstance(url, str) else url
    low = F.lower(c)
    host = url_host(c)
    score = F.lit(0.0)
    for w in words:
        # regex-escape the word: banned lists legitimately contain
        # metacharacters ('c++', 'a.b') that would otherwise change
        # match semantics or raise, divergently between engines
        in_host = F.regexp_like(host, F.lit(f"(^|[.]){re.escape(w)}($|[.])"))
        anywhere = low.contains(w)
        score = score + F.when(in_host, 1.0).when(anywhere, 0.5).otherwise(0.0)
    return F.least(score, F.lit(1.0))


def url_banned_score_sql(url: str, words: list[str] | None = None) -> str:
    words = words or DEFAULT_BANNED_WORDS
    host = url_host_sql(url)
    parts = []
    for w in words:
        q = _sql_quote(w)
        pat = _sql_quote(f"(^|[.]){re.escape(w)}($|[.])")
        parts.append(
            f"(CASE WHEN regexp_matches({host}, {pat}) THEN 1.0"
            f" WHEN contains(lower({url}), {q}) THEN 0.5 ELSE 0.0 END)"
        )
    return f"least({' + '.join(parts)}, 1.0)"


def url_filter(
    docs: DataFrame,
    url_col: str = "uri",
    blocklist: list[str] | None = None,
    banned_words: list[str] | None = None,
    max_score: float = 0.5,
) -> DataFrame:
    """Rows whose URL survives: host not in the blocklist and banned
    score < max_score. Both predicates are row-local (the blocklist
    is an isin literal — a broadcast anti-join when it outgrows a
    literal list); the scan prunes before any downstream work."""
    host = url_host(F.col(url_col))
    out = docs.withColumn("_host", host).withColumn(
        "_url_score", url_banned_score(F.col(url_col), banned_words)
    )
    if blocklist:
        out = out.filter(~F.col("_host").isin([b.lower() for b in blocklist]))
    return out.filter(F.col("_url_score") < max_score).drop("_host", "_url_score")


def url_dedup(
    docs: DataFrame, url_col: str = "uri", id_col: str = "rid"
) -> DataFrame:
    """(url_norm, survivor_id, n_dups): exact URL-level dedup on the
    normalized form — one url-keyed shuffle; the survivor is the
    md5-min id (deterministic, ingestion-order-unbiased, matching
    dedup.py's cluster survivor election)."""
    from pyspark.sql import Window

    norm = url_normalize(F.col(url_col))
    h = md5_int60(F.col(id_col).cast("string"), salt="urldedup:")
    w = Window.partitionBy("url_norm").orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.filter(F.col(url_col).isNotNull())
        .select(norm.alias("url_norm"), F.col(id_col))
        .withColumn("_rk", F.row_number().over(w))
        .groupBy("url_norm")
        .agg(
            F.min(F.when(F.col("_rk") == 1, F.col(id_col))).alias("survivor_id"),
            (F.count("*") - 1).cast("long").alias("n_dups"),
        )
        .orderBy("url_norm")
    )


def url_dedup_sql(docs_sql: str, url_col: str = "uri", id_col: str = "rid") -> str:
    norm = url_normalize_sql(url_col)
    h = md5_int60_sql(f"CAST({id_col} AS VARCHAR)", salt="urldedup:")
    return f"""
WITH u AS (
  SELECT {norm} AS url_norm, {id_col},
         row_number() OVER (
           PARTITION BY {norm} ORDER BY {h} ASC, {id_col} ASC
         ) AS _rk
  FROM ({docs_sql}) WHERE {url_col} IS NOT NULL
)
SELECT url_norm,
       MIN(CASE WHEN _rk = 1 THEN {id_col} END) AS survivor_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dups
FROM u GROUP BY url_norm
ORDER BY url_norm
"""
