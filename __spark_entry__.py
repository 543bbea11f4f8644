"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship hybrid-retrieval pipeline on sf0.001;
queries()/oracle_sql() expose every implemented SURVEY §2 operator
with its DuckDB oracle. Implementation lives in nucliadb_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nucliadb_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = registry.queries()
    flagship = qs.get("find_hybrid") or next(iter(qs.values()))
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
