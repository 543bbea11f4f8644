"""Knowledge-box entities service, served from the relation index.

The reference's EntitiesManager answers the /entitiesgroups endpoints
by querying the graph index rather than a stored catalog:

- ``get_indexed_entities_group(group)`` issues an undirected NODES
  graph search with ``node_type=ENTITY AND node_subtype=group`` and
  collects the distinct node values (top 500)
  (nucliadb/src/nucliadb/ingest/orm/entities.py:84-111).
- ``get_indexed_entities_groups_names`` runs a faceted search on the
  ``/e`` label family and takes the distinct facet tags — i.e. the
  distinct entity subtypes present in the index
  (nucliadb/src/nucliadb/ingest/orm/entities.py:138-168).

Spark mapping: both are projections over the triples table — a
union of (source, target) node sides, filter, distinct, aggregate.
The union is partition-local; the only shuffle is the final
distinct/groupBy, with map-side partial aggregation. At 100 TB the
triples scan prunes to the two node columns (ReadSchema) and the
distinct output is tiny (entity vocabulary, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nucliadb_spark.operators.filters import _sql_quote

# the reference's "wild guess" page size for indexed entity listing
# (ingest/orm/entities.py:90 `request.top_k = 500`)
GROUP_TOP_K = 500


def _nodes(relations: DataFrame) -> DataFrame:
    """Undirected node view of the triple table (both endpoints)."""
    return relations.select(
        F.col("source_value").alias("value"),
        F.col("source_type").alias("ntype"),
        F.col("source_subtype").alias("subtype"),
    ).unionAll(
        relations.select(
            F.col("target_value").alias("value"),
            F.col("target_type").alias("ntype"),
            F.col("target_subtype").alias("subtype"),
        )
    )


_NODES_SQL = """
  SELECT source_value AS value, source_type AS ntype,
         source_subtype AS subtype FROM relations
  UNION ALL
  SELECT target_value, target_type, target_subtype FROM relations
"""


def entities_group_members(
    relations: DataFrame, group: str, top_k: int = GROUP_TOP_K
) -> DataFrame:
    """Distinct entity values of one group: (value) ordered, top 500.

    Mirrors get_indexed_entities_group's undirected node search with
    node_type=ENTITY, node_subtype=group (entities.py:87-105); the
    reference dedups across shards with a dict update — here one
    DISTINCT spans all partitions.
    """
    return (
        _nodes(relations)
        .filter((F.col("ntype") == "ENTITY") & (F.col("subtype") == group))
        .select("value")
        .distinct()
        .orderBy("value")
        .limit(top_k)
    )


def entities_group_members_sql(
    relations_sql: str, group: str, top_k: int = GROUP_TOP_K
) -> str:
    return f"""
WITH relations AS ({relations_sql}),
nodes AS ({_NODES_SQL})
SELECT DISTINCT value
FROM nodes
WHERE ntype = 'ENTITY' AND subtype = {_sql_quote(group)}
ORDER BY value
LIMIT {top_k}
"""


def entities_groups_summary(relations: DataFrame) -> DataFrame:
    """Indexed entities-group names with member counts:
    (egroup, n_entities), ordered by name.

    The reference derives group names from the `/e` facet results
    (one tag per subtype, entities.py:143-161) and fills each
    EntitiesGroupSummary lazily; serving the per-group distinct-value
    count alongside is the same single aggregation in Spark.
    """
    return (
        _nodes(relations)
        .filter((F.col("ntype") == "ENTITY") & (F.col("subtype") != ""))
        .groupBy(F.col("subtype").alias("egroup"))
        .agg(F.countDistinct("value").alias("n_entities"))
        .orderBy("egroup")
    )


def entities_groups_summary_sql(relations_sql: str) -> str:
    return f"""
WITH relations AS ({relations_sql}),
nodes AS ({_NODES_SQL})
SELECT subtype AS egroup, COUNT(DISTINCT value) AS n_entities
FROM nodes
WHERE ntype = 'ENTITY' AND subtype <> ''
GROUP BY subtype
ORDER BY egroup
"""
