"""Planner rules: the request-parsing/planning decisions the
reference makes before any index is touched (SURVEY §2.2 F8, §2.3
T7, §2.7 O3/O6, §2.9 R3).

These are pure functions over the request — no DataFrames — mirrored
from the reference's Python planning layer and unit-tested against
its documented behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from nucliadb_spark.operators import filters as fx

# --- T7: exact-match detection / vector disable ----------------------------
# ref: search/search/query_parser/parsers/common.py:64-83 — an empty
# query or a fully-quoted query disables semantic search.

_QUOTED_RE = re.compile(r'^\s*"[^"]*"\s*$')


def should_disable_vector_search(query: str) -> bool:
    return not query.strip() or bool(_QUOTED_RE.match(query))


# --- O3: sort rules ---------------------------------------------------------
# ref: search/search/query_parser/parsers/search.py:168-182 — score
# sort for a non-empty query, created desc otherwise; title sort is
# catalog-only.


def default_sort(query: str, endpoint: str = "search") -> tuple[str, bool]:
    """→ (sort_field, ascending)."""
    if endpoint == "catalog":
        return ("created", False)
    if query.strip():
        return ("score", False)
    return ("created", False)


# --- O6: fusion window algebra (re-exported from find) ----------------------

from nucliadb_spark.operators.find import MAX_RANK_FUSION_WINDOW, fusion_window  # noqa: E402,F401

RERANKER_WINDOW_CAP = 200  # ref: query_parser/models.py:139


def reranker_window(top_k: int) -> int:
    """ref: parsers/common.py:250-275 — min(2·top_k, 200)."""
    return min(2 * top_k, RERANKER_WINDOW_CAP)


# --- R3: single-source fusion skip ------------------------------------------
# ref: rank_fusion.py:74-90 — fusion is skipped when only one
# retriever returned results.


def fusion_needed(source_counts: dict[str, int]) -> bool:
    return sum(1 for n in source_counts.values() if n > 0) > 1


# --- F8: legacy filter translation ------------------------------------------
# ref: search/search/query_parser/old_filters.py:48-262 — the legacy
# request shape (filters=[...facet strings...], keyword_filters,
# fields, range_creation_start/end, ...) translated into one
# FilterExpression tree. Facet strings starting '/' are label paths;
# a leading list nests as OR (the legacy "any-of" convention).


@dataclass
class LegacyFilters:
    filters: list = field(default_factory=list)  # str = facet AND'd; list = OR group
    keyword_filters: list[str] = field(default_factory=list)
    range_creation_start: str | None = None
    range_creation_end: str | None = None
    range_modification_start: str | None = None
    range_modification_end: str | None = None


def translate_old_filters(legacy: LegacyFilters) -> fx.Expr | None:
    clauses: list[fx.Expr] = []
    for f in legacy.filters:
        if isinstance(f, list):
            clauses.append(fx.Or([fx.Facet(x) for x in f]))
        else:
            clauses.append(fx.Facet(f))
    for kw in legacy.keyword_filters:
        clauses.append(fx.Keyword(kw))
    if legacy.range_creation_start or legacy.range_creation_end:
        clauses.append(
            fx.DateRange(
                "created", legacy.range_creation_start, legacy.range_creation_end
            )
        )
    if legacy.range_modification_start or legacy.range_modification_end:
        clauses.append(
            fx.DateRange(
                "modified",
                legacy.range_modification_start,
                legacy.range_modification_end,
            )
        )
    if not clauses:
        return None
    return fx.And(clauses) if len(clauses) > 1 else clauses[0]


DEFAULT_SEMANTIC_MIN_SCORE = 0.7  # ref: query_parser/parsers/common.py:38


def semantic_min_score(model_supplied: float | None) -> float:
    """The reference's fallback rule: the embedding model (Predict)
    normally supplies the semantic relevance threshold; when it
    doesn't, 0.7 applies (parsers/common.py:35-44). Registry queries
    pass explicit thresholds because the deterministic stub
    embeddings have a different score distribution than a real
    model — the RULE is what's ported, the constant is honored."""
    return (
        model_supplied if model_supplied is not None else DEFAULT_SEMANTIC_MIN_SCORE
    )


def prefilter_mode(n_allowed: int, n_total: int) -> str:
    """Driver-side prefilter classification, mirroring the reference's
    two planning fast paths:

    - 'none': no document survives the prefilter → skip every index
      search entirely (PrefilterResult::None, ref
      nidx/src/searcher/query_planner.rs:157-165; also
      shard_search.rs:355-360).
    - 'all': every document matches → drop the id set and serve from
      the prebuilt (unfiltered) index — the All fast detection of
      nidx/nidx_text/src/reader.rs:168-179, which avoids carrying
      (and broadcasting) a full-corpus id list.
    - 'some': carry the id set as a broadcast semijoin.

    Catalyst cannot make this call: it is a runtime cardinality
    decision taken before any job is submitted, exactly like the
    reference's scheduler."""
    if n_allowed == 0:
        return "none"
    if n_allowed >= n_total:
        return "all"
    return "some"
