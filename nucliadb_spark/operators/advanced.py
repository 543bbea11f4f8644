"""Advanced query mini-grammar (SURVEY §2.3 T5).

The reference exposes a raw tantivy query-language escape hatch,
leniently parsed and ANDed into the main query
(ref: nidx/nidx_paragraph/src/search_query.rs:202-210,
nidx/nidx_text/src/reader.rs:378-382). We support tantivy's useful
surface:

  +term             must appear
  -term             must not appear
  "a b c"           quoted phrase (positional)
  term              should appear (≥1 of the bare terms must match)
  field:term        term scoped to a named column
  field:"a b"       phrase scoped to a named column
  field:[a TO b]    inclusive range on a column ([* TO b] open end)
  field:{a TO b}    exclusive range
  +field:…/-field:… signs compose with field scoping

compiled to the same Expr tree the rest of the engine uses, so the
predicate pushes into the scan like any other filter. Range bounds
are typed like tantivy's schema-driven parser: numeric bounds
compare numerically, ISO dates as timestamps, anything else
lexicographically. Like the reference's parse_query_lenient, tokens
the grammar can't make sense of (e.g. a bare range with no field)
are ignored rather than failing the query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import functions as F

from nucliadb_spark.operators import bm25
from nucliadb_spark.operators.filters import (
    And,
    Expr,
    Keyword,
    Not,
    Or,
    _sql_quote,
)

# sign? (field:)? then one of: quoted phrase | [..] / {..} range | bare word
_TOKEN_RE = re.compile(
    r'([+-]?)(?:([A-Za-z_][A-Za-z0-9_]*):)?'
    r'(?:"([^"]*)"|(\[[^\]]*\]|\{[^}]*\})|([^\s"]+))'
)
_RANGE_RE = re.compile(r"^([\[{])\s*(.*?)\s+TO\s+(.*?)\s*([\]}])$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2})?$")


class Phrase(Expr):
    """Quoted-phrase predicate (positional containment)."""

    def __init__(self, phrase: str, column: str = "text"):
        self.phrase = phrase
        self.column = column

    def to_column(self):
        return bm25.phrase_match(self.column, self.phrase)

    def to_sql(self) -> str:
        return bm25.phrase_match_sql(self.column, self.phrase)


@dataclass
class TermRange(Expr):
    """tantivy `field:[a TO b]` / `{a TO b}` range on a column.

    Bound typing mirrors tantivy's schema-driven coercion: numeric
    bounds → numeric compare (column cast to double), ISO-date
    bounds → timestamp compare, else lexicographic term compare.
    `*` is an open end (ref: tantivy query grammar RangeQuery).
    """

    column: str
    lower: str | None
    upper: str | None
    incl_lower: bool = True
    incl_upper: bool = True

    def _typed(self):
        bounds = [b for b in (self.lower, self.upper) if b is not None]

        def is_num(s: str) -> bool:
            try:
                float(s)
                return True
            except ValueError:
                return False

        if bounds and all(is_num(b) for b in bounds):
            return "num"
        if bounds and all(_DATE_RE.match(b) for b in bounds):
            return "date"
        return "str"

    def to_column(self):
        kind = self._typed()
        c = F.col(self.column)
        if kind == "num":
            c = c.cast("double")
        elif kind == "date":
            c = c.cast("timestamp")
        conds = []
        if self.lower is not None:
            lit = F.lit(float(self.lower)) if kind == "num" else (
                F.lit(self.lower).cast("timestamp") if kind == "date"
                else F.lit(self.lower)
            )
            conds.append(c >= lit if self.incl_lower else c > lit)
        if self.upper is not None:
            lit = F.lit(float(self.upper)) if kind == "num" else (
                F.lit(self.upper).cast("timestamp") if kind == "date"
                else F.lit(self.upper)
            )
            conds.append(c <= lit if self.incl_upper else c < lit)
        out = conds[0]
        for cond in conds[1:]:
            out = out & cond
        return out

    def to_sql(self) -> str:
        kind = self._typed()
        col = self.column
        if kind == "num":
            col = f"CAST({col} AS DOUBLE)"
        elif kind == "date":
            col = f"CAST({col} AS TIMESTAMP)"

        def lit(b: str) -> str:
            if kind == "num":
                return repr(float(b))
            if kind == "date":
                return f"TIMESTAMP {_sql_quote(b.replace('T', ' '))}"
            return _sql_quote(b)

        parts = []
        if self.lower is not None:
            parts.append(f"{col} {'>=' if self.incl_lower else '>'} {lit(self.lower)}")
        if self.upper is not None:
            parts.append(f"{col} {'<=' if self.incl_upper else '<'} {lit(self.upper)}")
        return "(" + " AND ".join(parts) + ")"


def _parse_range(column: str, body: str) -> Expr | None:
    m = _RANGE_RE.match(body)
    if not m:
        return None
    open_b, lo, hi, close_b = m.groups()
    return TermRange(
        column,
        None if lo == "*" else lo,
        None if hi == "*" else hi,
        incl_lower=open_b == "[",
        incl_upper=close_b == "]",
    )


def parse_advanced(query: str, column: str = "text") -> Expr:
    """Lenient parse → Expr. Raises on an empty/only-negative query
    (the reference's lenient parser also yields no-op there);
    individually malformed tokens are skipped, not fatal."""
    musts: list[Expr] = []
    must_nots: list[Expr] = []
    shoulds: list[Expr] = []
    for m in _TOKEN_RE.finditer(query):
        sign, field, phrase, rng, word = m.groups()
        col = field or column
        leaf: Expr | None
        if phrase is not None:
            leaf = Phrase(phrase, col)
            if not sign:
                sign = "+"  # bare phrases are must (as before)
        elif rng is not None:
            if field is None:
                continue  # lenient: a range needs a field
            leaf = _parse_range(col, rng)
            if leaf is None:
                continue
            if not sign:
                sign = "+"  # a range is a hard predicate, not a should
        elif word:
            if word in ("+", "-"):
                continue
            leaf = Keyword(word, col)
            if field is not None and not sign:
                sign = "+"  # field-scoped terms are hard predicates
        else:
            continue
        if sign == "+":
            musts.append(leaf)
        elif sign == "-":
            must_nots.append(Not(leaf))
        else:
            shoulds.append(leaf)
    clauses: list[Expr] = musts + must_nots
    if shoulds:
        clauses.append(Or(shoulds) if len(shoulds) > 1 else shoulds[0])
    if not clauses:
        raise ValueError(f"unparsable advanced query: {query!r}")
    return And(clauses) if len(clauses) > 1 else clauses[0]
