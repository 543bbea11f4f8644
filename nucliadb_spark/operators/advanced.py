"""Advanced query mini-grammar (SURVEY §2.3 T5).

The reference exposes a raw tantivy query-language escape hatch,
leniently parsed and ANDed into the main query
(ref: nidx/nidx_paragraph/src/search_query.rs:202-210,
nidx/nidx_text/src/reader.rs:378-382). We support the useful core:

  +term      must appear
  -term      must not appear
  "a b c"    quoted phrase (positional)
  term       should appear (≥1 of the bare terms must match)

compiled to the same Expr tree the rest of the engine uses, so the
predicate pushes into the scan like any other filter.
"""

from __future__ import annotations

import re

from nucliadb_spark.operators import bm25
from nucliadb_spark.operators.filters import And, Expr, Keyword, Not, Or

_TOKEN_RE = re.compile(r'"([^"]*)"|(\S+)')


class Phrase(Expr):
    """Quoted-phrase predicate (positional containment)."""

    def __init__(self, phrase: str, column: str = "text"):
        self.phrase = phrase
        self.column = column

    def to_column(self):
        return bm25.phrase_match(self.column, self.phrase)

    def to_sql(self) -> str:
        return bm25.phrase_match_sql(self.column, self.phrase)


def parse_advanced(query: str, column: str = "text") -> Expr:
    """Lenient parse → Expr. Raises on an empty/only-negative query
    (the reference's lenient parser also yields no-op there)."""
    musts: list[Expr] = []
    must_nots: list[Expr] = []
    shoulds: list[Expr] = []
    for m in _TOKEN_RE.finditer(query):
        phrase, word = m.group(1), m.group(2)
        if phrase is not None:
            musts.append(Phrase(phrase, column))
        elif word.startswith("+") and len(word) > 1:
            musts.append(Keyword(word[1:], column))
        elif word.startswith("-") and len(word) > 1:
            must_nots.append(Not(Keyword(word[1:], column)))
        else:
            shoulds.append(Keyword(word, column))
    clauses: list[Expr] = musts + must_nots
    if shoulds:
        clauses.append(Or(shoulds) if len(shoulds) > 1 else shoulds[0])
    if not clauses:
        raise ValueError(f"unparsable advanced query: {query!r}")
    return And(clauses) if len(clauses) > 1 else clauses[0]
