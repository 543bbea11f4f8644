"""nucliadb_spark — a PySpark-native hybrid search / analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of nuclia/nucliadb (the reference lives at
/root/reference, cited as ``ref:`` file:line in docstrings) as an
idiomatic PySpark engine:

- catalog search (filters, facets, sort, pagination)  — Spark SQL
- BM25 keyword retrieval over paragraph/field text    — DataFrame aggs
- exact & approximate KNN over embedding columns      — JVM expressions + IVF
- knowledge-graph triple path queries                 — DataFrame joins
- reciprocal-rank fusion / hybrid retrieval pipeline  — window functions
- LLM-data-pipeline extras: dedup (exact/minhash/simhash/jaccard),
  text quality & language heuristics, ANN similarity search
- incremental index maintenance                       — Structured Streaming

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection and whole-stage codegen; Python UDFs are not
used in any hot path.
"""

__version__ = "0.1.0"

from nucliadb_spark.api import FindRequest, find_request  # noqa: E402,F401
from nucliadb_spark.session import get_session  # noqa: E402,F401
