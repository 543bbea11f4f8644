"""Graph search over the relations triple table (SURVEY §2.5 G1-G8).

The reference indexes one tantivy doc per triple and compiles a
boolean path query over (source, relation, destination) parts
(ref: nidx/nidx_relation/src/graph_query_parser.rs:153-630, exec
reader.rs:100-179 `paths_graph_search`). Spark-first, a triple store
IS a DataFrame, so:

- path query   = boolean Column predicate over the triples scan
  (Catalyst pushes it into the parquet read),
- node match kinds FULL/PREFIX/WORDS/FUZZY
  (ref: nodereader.proto:156-184, graph_query_parser.rs:480-581)
  = ==, startswith, token containment, levenshtein<=1,
- undirected   = the same node predicate OR-ed across both ends
  (ref: graph_query_parser.rs parse_path_query undirected arm),
- nodes / relations projections (G4, reader.rs:181-259) =
  union(source, target) → groupBy → top-k,
- neighborhood (G5) = `source IN entities OR target IN entities`,
- multi-hop (G7's iterative expansion) = self-joins; each hop is one
  shuffle join keyed on the hop node — at scale the relations table
  is bucketed by source_value so hop joins co-locate, and a selective
  first hop broadcasts into the second.

Everything is a row-local predicate or a keyed join — no UDFs.
Each builder has a SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from nucliadb_spark.functions.text import tokenize, tokenize_sql
from nucliadb_spark.operators.filters import Expr, _sql_quote

FUZZY_DISTANCE = 1  # ref: nidx/nidx_relation/src/reader.rs:33

PATH_COLS = [
    "source_value",
    "source_type",
    "source_subtype",
    "relation_label",
    "target_value",
    "target_type",
    "target_subtype",
]


def _value_match(col: str, value: str, kind: str) -> Column:
    """Match kinds FULL/PREFIX/WORDS/PREFIX_WORDS × exact/fuzzy
    (ref: nodereader.proto:156-184, graph_query_parser.rs:480-581).

    fuzzy_prefix: the node has a prefix within edit distance 1 of the
    query — since lev(s[:k], q) ≥ |k - len(q)|, only prefixes of
    length len(q)-1 … len(q)+1 can qualify, so three levenshtein
    probes characterize the tantivy prefix-automaton exactly.
    """
    c = F.col(col)
    v = value.lower()
    if kind == "full":
        return c == value
    if kind == "prefix":
        return c.startswith(value)
    if kind == "words":
        return F.exists(tokenize(col), lambda t: t == F.lit(v))
    if kind == "prefix_words":
        return F.exists(tokenize(col), lambda t: t.startswith(v))
    if kind == "fuzzy":
        return F.levenshtein(F.lower(c), F.lit(v)) <= FUZZY_DISTANCE
    if kind == "fuzzy_prefix":
        n = len(v)
        probes = [
            F.levenshtein(F.substring(F.lower(c), 1, k), F.lit(v)) <= FUZZY_DISTANCE
            for k in (max(n - 1, 1), n, n + 1)
        ]
        out = probes[0]
        for p in probes[1:]:
            out = out | p
        return out
    raise ValueError(f"unknown match kind {kind}")


def _value_match_sql(col: str, value: str, kind: str) -> str:
    q = _sql_quote(value)
    v = value.lower()
    ql = _sql_quote(v)
    if kind == "full":
        return f"{col} = {q}"
    if kind == "prefix":
        return f"starts_with({col}, {q})"
    if kind == "words":
        return f"list_contains({tokenize_sql(col)}, {ql})"
    if kind == "prefix_words":
        return f"len(list_filter({tokenize_sql(col)}, t -> starts_with(t, {ql}))) > 0"
    if kind == "fuzzy":
        return f"levenshtein(lower({col}), {ql}) <= {FUZZY_DISTANCE}"
    if kind == "fuzzy_prefix":
        n = len(v)
        probes = " OR ".join(
            f"levenshtein(substring(lower({col}), 1, {k}), {ql}) <= {FUZZY_DISTANCE}"
            for k in (max(n - 1, 1), n, n + 1)
        )
        return f"({probes})"
    raise ValueError(f"unknown match kind {kind}")


@dataclass
class Node(Expr):
    """Match a node on one side of the triple (or either side).

    side: 'source' | 'target' | 'any' (undirected).
    kind: 'full' | 'prefix' | 'words' | 'fuzzy'.
    """

    value: str
    side: str = "source"
    kind: str = "full"
    subtype: str | None = None

    def _one_side(self, side: str) -> Column:
        cond = _value_match(f"{side}_value", self.value, self.kind)
        if self.subtype is not None:
            cond = cond & (F.col(f"{side}_subtype") == self.subtype)
        return cond

    def to_column(self) -> Column:
        if self.side == "any":
            return self._one_side("source") | self._one_side("target")
        return self._one_side(self.side)

    def _one_side_sql(self, side: str) -> str:
        s = _value_match_sql(f"{side}_value", self.value, self.kind)
        if self.subtype is not None:
            s = f"({s} AND {side}_subtype = {_sql_quote(self.subtype)})"
        return s

    def to_sql(self) -> str:
        if self.side == "any":
            return f"({self._one_side_sql('source')} OR {self._one_side_sql('target')})"
        return self._one_side_sql(self.side)


@dataclass
class Relation(Expr):
    """Match the relation label of the triple."""

    label: str
    kind: str = "full"

    def to_column(self) -> Column:
        return _value_match("relation_label", self.label, self.kind)

    def to_sql(self) -> str:
        return _value_match_sql("relation_label", self.label, self.kind)


# --- G1: path search -----------------------------------------------------


def path_search(relations: DataFrame, query: Expr, top_k: int = 50) -> DataFrame:
    """Boolean path query → matching triples, deterministic order.

    Reference paths carry a constant score (reader.rs paths TopDocs);
    ordering here is the stable triple key.
    """
    return (
        relations.filter(query.to_column())
        .select(*PATH_COLS)
        .orderBy("source_value", "relation_label", "target_value")
        .limit(top_k)
    )


def path_search_sql(relations_sql: str, query: Expr, top_k: int = 50) -> str:
    return f"""
WITH relations AS ({relations_sql})
SELECT {", ".join(PATH_COLS)}
FROM relations
WHERE {query.to_sql()}
ORDER BY source_value, relation_label, target_value
LIMIT {top_k}
"""


# --- G4: nodes / relations projections ------------------------------------


def nodes_projection(relations: DataFrame, query: Expr | None = None, top_k: int = 50) -> DataFrame:
    """Unique nodes (source ∪ target) with degree, top-k by degree.

    ref: reader.rs:181-259 top_unique_n — reference ranks by best
    score (constant for boolean queries); degree is the meaningful
    batch analog and keeps ordering deterministic.
    """
    df = relations if query is None else relations.filter(query.to_column())
    nodes = df.select(
        F.col("source_value").alias("value"), F.col("source_subtype").alias("subtype")
    ).unionAll(
        df.select(
            F.col("target_value").alias("value"),
            F.col("target_subtype").alias("subtype"),
        )
    )
    return (
        nodes.groupBy("value", "subtype")
        .agg(F.count("*").alias("degree"))
        .orderBy(F.col("degree").desc(), F.col("value").asc())
        .limit(top_k)
    )


def nodes_projection_sql(relations_sql: str, query: Expr | None = None, top_k: int = 50) -> str:
    where = f"WHERE {query.to_sql()}" if query is not None else ""
    return f"""
WITH relations AS ({relations_sql}),
filtered AS (SELECT * FROM relations {where}),
nodes AS (
  SELECT source_value AS value, source_subtype AS subtype FROM filtered
  UNION ALL
  SELECT target_value, target_subtype FROM filtered
)
SELECT value, subtype, COUNT(*) AS degree
FROM nodes
GROUP BY value, subtype
ORDER BY degree DESC, value ASC
LIMIT {top_k}
"""


def relations_projection(relations: DataFrame, query: Expr | None = None) -> DataFrame:
    """Unique relation labels with triple counts."""
    df = relations if query is None else relations.filter(query.to_column())
    return (
        df.groupBy("relation_label")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("relation_label").asc())
    )


def relations_projection_sql(relations_sql: str, query: Expr | None = None) -> str:
    where = f"WHERE {query.to_sql()}" if query is not None else ""
    return f"""
WITH relations AS ({relations_sql})
SELECT relation_label, COUNT(*) AS n
FROM relations {where}
GROUP BY relation_label
ORDER BY n DESC, relation_label ASC
"""


# --- G5: entity neighborhood ----------------------------------------------


def neighborhood(relations: DataFrame, entities: list[str], top_k: int = 100) -> DataFrame:
    """1-hop subgraph around detected query entities
    (ref: parsers/find.py:169-201 → EntitySubgraph)."""
    cond = F.col("source_value").isin(entities) | F.col("target_value").isin(entities)
    return (
        relations.filter(cond)
        .select(*PATH_COLS)
        .orderBy("source_value", "relation_label", "target_value")
        .limit(top_k)
    )


def neighborhood_sql(relations_sql: str, entities: list[str], top_k: int = 100) -> str:
    lst = ", ".join(_sql_quote(e) for e in entities)
    return f"""
WITH relations AS ({relations_sql})
SELECT {", ".join(PATH_COLS)}
FROM relations
WHERE source_value IN ({lst}) OR target_value IN ({lst})
ORDER BY source_value, relation_label, target_value
LIMIT {top_k}
"""


# --- G7 (bounded): multi-hop path expansion --------------------------------


def two_hop(
    relations: DataFrame,
    start: Expr,
    top_k: int = 100,
) -> DataFrame:
    """2-hop paths a→b→c from triples matching `start`.

    Physical shape: the selective first hop broadcasts into a join
    keyed on the hop node (target_value == source_value). At scale
    with a non-selective start this becomes a shuffle join co-located
    by bucketing on source_value.
    """
    a = relations.filter(start.to_column()).alias("a")
    b = relations.alias("b")
    return (
        a.join(b, F.col("a.target_value") == F.col("b.source_value"))
        .select(
            F.col("a.source_value").alias("start_value"),
            F.col("a.relation_label").alias("hop1"),
            F.col("a.target_value").alias("mid_value"),
            F.col("b.relation_label").alias("hop2"),
            F.col("b.target_value").alias("end_value"),
        )
        .orderBy("start_value", "mid_value", "end_value", "hop1", "hop2")
        .limit(top_k)
    )


def two_hop_sql(relations_sql: str, start: Expr, top_k: int = 100) -> str:
    return f"""
WITH relations AS ({relations_sql})
SELECT a.source_value AS start_value,
       a.relation_label AS hop1,
       a.target_value AS mid_value,
       b.relation_label AS hop2,
       b.target_value AS end_value
FROM relations a
JOIN relations b ON a.target_value = b.source_value
WHERE {start.to_sql().replace("source_value", "a.source_value").replace("relation_label", "a.relation_label").replace("target_value", "a.target_value")}
ORDER BY start_value, mid_value, end_value, hop1, hop2
LIMIT {top_k}
"""
