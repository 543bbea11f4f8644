"""PII detection / redaction for training-data pipelines.

The reference KB stores user-supplied documents verbatim; scrubbing
personally-identifiable strings before a corpus feeds model training
is an engine-level concern at 100 TB (the C4/Dolma pipelines run the
same regex family: emails, phone-like digit runs, IP addresses).

Everything is a row-local regexp Column expression — detection uses
``regexp_count`` and redaction ``regexp_replace`` (both JVM
whole-stage codegen; zero shuffles, linear scan). Patterns are kept
to the syntax subset Java regex and DuckDB/RE2 agree on (character
classes, bounded repeats, ``\\b``), so the DuckDB twin is exact.

The synthetic corpus is PII-free word soup, so the registered query
plants deterministic PII spans first (same arithmetic in both
engines) — mirroring how `dedup.planted_corpus` makes near-dup
behavior testable on clean data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# shared Java/RE2 syntax subset only
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}-\d{2}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IP_RE, "<IP>"),
]


def plant_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Append deterministic PII spans to a subset of docs:
    every 7th doc an email, every 11th a phone, every 13th an IP
    (some docs get several — multiples of 77/91/143 exercise the
    multi-kind path)."""
    did = F.col(id_col)
    email = F.when(
        did % 7 == 0,
        F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" call 555-0100-"), F.lpad((did % 100).cast("string"), 2, "0")
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 13 == 0,
        F.concat(
            F.lit(" from 10.0."), (did % 256).cast("string"),
            F.lit("."), ((did * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        did.alias(id_col),
        F.concat(F.col(text_col), email, phone, ip).alias(text_col),
    )


def plant_pii_sql(docs_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT {id_col},
       concat(
         {text_col},
         CASE WHEN {id_col} % 7 = 0
              THEN concat(' contact user', {id_col}, '@example.com') ELSE '' END,
         CASE WHEN {id_col} % 11 = 0
              THEN concat(' call 555-0100-', lpad(({id_col} % 100)::VARCHAR, 2, '0'))
              ELSE '' END,
         CASE WHEN {id_col} % 13 = 0
              THEN concat(' from 10.0.', ({id_col} % 256)::VARCHAR, '.',
                          (({id_col} * 7) % 256)::VARCHAR)
              ELSE '' END
       ) AS {text_col}
FROM ({docs_sql})
"""


def pii_scan(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_emails, n_phones, n_ips, has_pii, redacted).

    Detection counts per kind plus the redacted text (all kinds
    replaced by typed placeholders, email first so an address's
    digit runs can't double-match the phone pattern).
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    n_ips = F.regexp_count(t, F.lit(IP_RE))
    red = t
    for pat, repl in REDACTIONS:
        red = F.regexp_replace(red, pat, repl)
    return docs.select(
        F.col(id_col).alias("id"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_ips.cast("long").alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).cast("int").alias("has_pii"),
        red.alias("redacted"),
    ).orderBy("id")


def pii_scan_sql(docs_sql: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    def esc(p: str) -> str:
        # DuckDB '...' literals are escape-free (only '' needs care),
        # so the regex backslashes pass through verbatim
        return p.replace("'", "''")

    red = text_col
    for pat, repl in REDACTIONS:
        red = f"regexp_replace({red}, '{esc(pat)}', '{repl}', 'g')"
    return f"""
WITH docs AS ({docs_sql})
SELECT {id_col} AS id,
       len(regexp_extract_all({text_col}, '{esc(EMAIL_RE)}'))::BIGINT AS n_emails,
       len(regexp_extract_all({text_col}, '{esc(PHONE_RE)}'))::BIGINT AS n_phones,
       len(regexp_extract_all({text_col}, '{esc(IP_RE)}'))::BIGINT AS n_ips,
       (len(regexp_extract_all({text_col}, '{esc(EMAIL_RE)}'))
        + len(regexp_extract_all({text_col}, '{esc(PHONE_RE)}'))
        + len(regexp_extract_all({text_col}, '{esc(IP_RE)}')) > 0)::INT AS has_pii,
       {red} AS redacted
FROM docs
ORDER BY id
"""
