"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL twin.

This is the single source for ``__spark_entry__.queries()`` /
``oracle_sql()`` and for the local parity tests. Keys map 1:1 to
SURVEY.md §2 operator ids (noted in each docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # importing these modules populates the registry
    from nucliadb_spark.plans import queries_catalog  # noqa: F401

    try:
        from nucliadb_spark.plans import queries_text  # noqa: F401
    except ImportError:
        pass
    try:
        from nucliadb_spark.plans import queries_vector  # noqa: F401
    except ImportError:
        pass
    try:
        from nucliadb_spark.plans import queries_graph  # noqa: F401
    except ImportError:
        pass
    try:
        from nucliadb_spark.plans import queries_pipeline  # noqa: F401
    except ImportError:
        pass
    try:
        from nucliadb_spark.plans import queries_dataops  # noqa: F401
    except ImportError:
        pass
    try:
        from nucliadb_spark.plans import queries_streaming  # noqa: F401
    except ImportError:
        pass
    _LOADED = True
