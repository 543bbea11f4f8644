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
        # |len| band is necessary for distance <= 1 (cheap codegen
        # prune); bounded levenshtein early-exits the DP above bound
        return (F.abs(F.length(c) - F.lit(len(v))) <= FUZZY_DISTANCE) & (
            F.levenshtein(F.lower(c), F.lit(v), FUZZY_DISTANCE) >= 0
        )
    if kind == "fuzzy_prefix":
        n = len(v)
        probes = [
            F.levenshtein(F.substring(F.lower(c), 1, k), F.lit(v), FUZZY_DISTANCE) >= 0
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
        # broadcast the SELECTIVE first hop, not the full edge table —
        # without the hint the planner sees both sides under the
        # autoBroadcast threshold and may build the 10^6-row side
        F.broadcast(a).join(b, F.col("a.target_value") == F.col("b.source_value"))
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


# --- G7 proper: iterative graph RAG strategy --------------------------------
# The reference's graph_strategy loop
# (nucliadb/src/nucliadb/search/search/graph_strategy.py:315-466):
#   hop 0  — fuzzy entity detection from the query: each query WORD
#            fuzzy-matches (distance 1) any word of any node value,
#            top-50 nodes (fuzzy_search_entities, :468-501 — "Rose
#            Hamiltn" matches "Rosa Parks" and "Margaret Hamilton");
#   hop h  — fetch relations touching the frontier, rank them against
#            the query, keep top_k; newly-seen endpoints of the KEPT
#            relations (minus explored) become the next frontier.
# The reranker is the Predict API there; here it is the deterministic
# md5 stub (functions/models.py) as a pure JVM Column expression, with
# a per-hop decay so earlier hops outrank later ones. The loop is
# driver-side (like the reference's), each hop one DataFrame job:
# frontier/explored stay DataFrames (broadcast semi-joins, no collect).


def strategy_detect_entities(
    relations: DataFrame, query: str, detect_top: int = 50
) -> DataFrame:
    """Hop-0 entity detection → (value,). Any query word within
    levenshtein 1 of any node-value word detects the node."""
    from nucliadb_spark.functions.text import tokenize_py

    qtoks = tokenize_py(query)
    qarr = F.array(*[F.lit(t) for t in qtoks])
    nodes = (
        relations.select(F.col("source_value").alias("value"))
        .unionByName(relations.select(F.col("target_value").alias("value")))
        .distinct()
    )
    return (
        nodes.filter(
            F.exists(
                tokenize(F.col("value")),
                lambda w: F.exists(
                    qarr, lambda q: F.levenshtein(w, q) <= FUZZY_DISTANCE
                ),
            )
        )
        .orderBy("value")
        .limit(detect_top)
    )


def _strategy_score(query: str, hop: int, decay: float) -> Column:
    """Deterministic relation relevance (rank_relations stub): md5 of
    query|source|label|target → [0,1], decayed per hop. Pure Column
    expression — whole-stage codegen, no Python."""
    pair = F.concat_ws(
        "|", F.lit(query), "source_value", "relation_label", "target_value"
    )
    raw = F.conv(F.substring(F.md5(pair), 1, 8), 16, 10).cast("long") / F.lit(
        4294967295.0
    )
    return F.round(F.lit(decay ** (hop - 1)) * raw, 6).cast("double")


def strategy_search(
    relations: DataFrame,
    query: str,
    hops: int = 2,
    top_k: int = 20,
    detect_top: int = 50,
    decay: float = 0.5,
) -> DataFrame:
    """Bounded iterative expand-and-rerank loop (G7 proper) →
    (hop, source_value, relation_label, target_value, score).

    Triples seen at several hops keep their earliest (highest) score.
    At 100 TB each hop is one broadcast-semi-joined scan of the
    relations table (frontier ≤ 2·top_k values), hops ≤ 3 — the same
    bounded fan-out the reference enforces via GraphStrategy.hops.
    """
    frontier = strategy_detect_entities(relations, query, detect_top)
    explored: DataFrame | None = None
    kept_frames: list[DataFrame] = []
    for hop in range(1, hops + 1):
        fr = frontier.select("value")
        touching = relations.alias("r").join(
            F.broadcast(fr.alias("f")),
            (F.col("r.source_value") == F.col("f.value"))
            | (F.col("r.target_value") == F.col("f.value")),
            "leftsemi",
        )
        kept = (
            touching.select(
                F.lit(hop).alias("hop"),
                "source_value",
                "relation_label",
                "target_value",
                _strategy_score(query, hop, decay).alias("score"),
            )
            .orderBy(
                F.col("score").desc(),
                "source_value",
                "relation_label",
                "target_value",
            )
            .limit(top_k)
        )
        kept_frames.append(kept)
        if hop == hops:
            break
        explored = (
            frontier
            if explored is None
            else explored.unionByName(frontier).distinct()
        )
        knodes = (
            kept.select(F.col("source_value").alias("value"))
            .unionByName(kept.select(F.col("target_value").alias("value")))
            .distinct()
        )
        frontier = knodes.join(explored, "value", "anti")
    allk = kept_frames[0]
    for f in kept_frames[1:]:
        allk = allk.unionByName(f)
    return (
        allk.groupBy("source_value", "relation_label", "target_value")
        .agg(F.min("hop").alias("hop"), F.max("score").alias("score"))
        .select("hop", "source_value", "relation_label", "target_value", "score")
        .orderBy(
            F.col("score").desc(), "source_value", "relation_label", "target_value"
        )
        .limit(top_k)
    )


def strategy_search_sql(
    relations_sql: str,
    query: str,
    hops: int = 2,
    top_k: int = 20,
    detect_top: int = 50,
    decay: float = 0.5,
) -> str:
    """DuckDB twin of :func:`strategy_search` — the hop loop unrolled
    into one CTE chain per hop (hops is a query-time constant)."""
    from nucliadb_spark.functions.text import tokenize_py

    qtoks = tokenize_py(query)
    qlist = "[" + ", ".join(_sql_quote(t) for t in qtoks) + "]"
    qlit = _sql_quote(query)

    def score(hop: int) -> str:
        pair = (
            f"concat_ws('|', {qlit}, source_value, relation_label, target_value)"
        )
        raw = f"(CAST(('0x' || substring(md5({pair}), 1, 8)) AS BIGINT) / 4294967295.0)"
        return f"ROUND({decay ** (hop - 1)!r} * {raw}, 6)::DOUBLE"

    ctes = [
        f"relations AS ({relations_sql})",
        "nodes AS (SELECT source_value AS value FROM relations "
        "UNION SELECT target_value FROM relations)",
        f"""detected AS (
  SELECT value FROM nodes
  WHERE len(list_filter({tokenize_sql("value")},
        w -> len(list_filter({qlist}, q -> levenshtein(w, q) <= {FUZZY_DISTANCE})) > 0)) > 0
  ORDER BY value LIMIT {detect_top})""",
        "frontier1 AS (SELECT value FROM detected)",
    ]
    for hop in range(1, hops + 1):
        ctes.append(
            f"""kept{hop} AS (
  SELECT {hop} AS hop, source_value, relation_label, target_value,
         {score(hop)} AS score
  FROM relations
  WHERE source_value IN (SELECT value FROM frontier{hop})
     OR target_value IN (SELECT value FROM frontier{hop})
  ORDER BY score DESC, source_value, relation_label, target_value
  LIMIT {top_k})"""
        )
        if hop == hops:
            break
        if hop == 1:
            ctes.append("explored1 AS (SELECT value FROM frontier1)")
        else:
            ctes.append(
                f"explored{hop} AS (SELECT value FROM explored{hop - 1} "
                f"UNION SELECT value FROM frontier{hop})"
            )
        ctes.append(
            f"""frontier{hop + 1} AS (
  SELECT value FROM (SELECT source_value AS value FROM kept{hop}
                     UNION SELECT target_value FROM kept{hop})
  WHERE value NOT IN (SELECT value FROM explored{hop}))"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM kept{h}" for h in range(1, hops + 1)
    )
    return f"""
WITH {", ".join(ctes)},
all_kept AS ({union})
SELECT MIN(hop) AS hop, source_value, relation_label, target_value,
       MAX(score) AS score
FROM all_kept
GROUP BY source_value, relation_label, target_value
ORDER BY score DESC, source_value, relation_label, target_value
LIMIT {top_k}
"""


# --- vector (semantic) graph search over node + edge embeddings -------------
# ref: nidx/tests/integration/vector_relation_index.rs +
# graph_query_parser.rs:480-630 — a VectorMatch clause first KNNs the
# node-vector / edge-vector sidecars (min_score cut), then the path
# query matches triples against the resulting (value, score) sets as
# const-score clauses; tantivy's boolean union SUMS the scores, so a
# path matching both endpoints and its edge scores ~3 components.


def semantic_path_search(
    relations: DataFrame,
    node_vecs: DataFrame,
    edge_vecs: DataFrame,
    query: DataFrame,
    min_node: float = 0.7,
    min_edge: float = 0.7,
    top_k: int = 100,
) -> DataFrame:
    """Paths where ≥1 endpoint semantically matches the query vector;
    score = Σ matched endpoint cosines + matched edge cosine.

    node_vecs: (value, vector); edge_vecs: (label, vector);
    query: 1-row (qvec). Matched sets are tiny (min_score-cut KNN
    output) and broadcast into the triples scan — the big table is
    touched once, no shuffle.
    """
    from nucliadb_spark.functions import vector as V

    nm = (
        node_vecs.crossJoin(F.broadcast(query))
        .select(
            "value",
            F.round(V.cosine(F.col("vector"), F.col("qvec")), 6).alias("nscore"),
        )
        .filter(F.col("nscore") >= min_node)
    )
    em = (
        edge_vecs.crossJoin(F.broadcast(query))
        .select(
            "label",
            F.round(V.cosine(F.col("vector"), F.col("qvec")), 6).alias("escore"),
        )
        .filter(F.col("escore") >= min_edge)
    )
    src = nm.select(F.col("value").alias("source_value"), F.col("nscore").alias("s_score"))
    dst = nm.select(F.col("value").alias("target_value"), F.col("nscore").alias("d_score"))
    edge = em.select(F.col("label").alias("relation_label"), F.col("escore").alias("e_score"))
    return (
        relations.join(F.broadcast(src), "source_value", "left")
        .join(F.broadcast(dst), "target_value", "left")
        .join(F.broadcast(edge), "relation_label", "left")
        .filter(F.col("s_score").isNotNull() | F.col("d_score").isNotNull())
        .select(
            "source_value",
            "relation_label",
            "target_value",
            F.round(
                F.coalesce(F.col("s_score"), F.lit(0.0))
                + F.coalesce(F.col("d_score"), F.lit(0.0))
                + F.coalesce(F.col("e_score"), F.lit(0.0)),
                5,
            )
            .cast("double")
            .alias("score"),
        )
        .orderBy(
            F.col("score").desc(), "source_value", "relation_label", "target_value"
        )
        .limit(top_k)
    )


def semantic_path_search_sql(
    relations_sql: str,
    node_vecs_sql: str,
    edge_vecs_sql: str,
    query_sql: str,
    dim: int,
    min_node: float = 0.7,
    min_edge: float = 0.7,
    top_k: int = 100,
) -> str:
    from nucliadb_spark.functions import vector as V

    ncos = V.cosine_sql_unrolled("v.vector", "q.qvec", dim)
    return f"""
WITH relations AS ({relations_sql}),
node_vecs AS ({node_vecs_sql}),
edge_vecs AS ({edge_vecs_sql}),
q AS ({query_sql}),
nm AS (
  SELECT * FROM (
    SELECT v.value, ROUND({ncos}, 6) AS nscore
    FROM node_vecs v CROSS JOIN q
  ) WHERE nscore >= {min_node!r}
),
em AS (
  SELECT * FROM (
    SELECT v.label, ROUND({ncos}, 6) AS escore
    FROM edge_vecs v CROSS JOIN q
  ) WHERE escore >= {min_edge!r}
)
SELECT r.source_value, r.relation_label, r.target_value,
       ROUND(COALESCE(s.nscore, 0.0) + COALESCE(d.nscore, 0.0)
             + COALESCE(e.escore, 0.0), 5)::DOUBLE AS score
FROM relations r
LEFT JOIN nm s ON r.source_value = s.value
LEFT JOIN nm d ON r.target_value = d.value
LEFT JOIN em e ON r.relation_label = e.label
WHERE s.value IS NOT NULL OR d.value IS NOT NULL
ORDER BY score DESC, r.source_value, r.relation_label, r.target_value
LIMIT {top_k}
"""
