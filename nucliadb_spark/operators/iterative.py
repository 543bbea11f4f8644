"""Iterative graph algorithms on DataFrames — driver-side loops of
narrow join/agg steps, the Spark-native shape for algorithms the
reference embeds in its graph index (multi-hop traversal beyond the
bounded self-join, ref nucliadb/src/nucliadb/search/search/
graph_strategy.py:315-466) and for the transitive-closure step a
dedup pipeline needs after pair-finding (LSH gives PAIRS; removal
needs CLUSTERS: A~B, B~C must collapse into one group even when A≁C).

Scale notes (the loop is the plan — each point is load-bearing):
- every iteration is one shuffle keyed by the frontier/edge key;
  `localCheckpoint(eager=True)` after each step truncates lineage so
  iteration N doesn't replay iterations 1..N-1 (and keeps the plan
  from growing unboundedly);
- BFS state is (visited, frontier): joins are frontier-sized, not
  graph-sized — at 100 TB the frontier broadcast-joins against the
  bucketed edge table while it stays small, and AQE switches to a
  shuffle join when it grows;
- label propagation state is one (node, label) row per node; the
  iteration count is the graph diameter, and near-dup graphs are
  shallow (dup clusters are cliques-ish), so convergence is fast.
  For adversarial long-chain graphs, the large-star/small-star
  variant halves diameter per round; the simple form is kept here
  because dedup components are tiny and the oracle must stay
  expressible as a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs_reachability(
    edges: DataFrame,
    start: str,
    max_hops: int = 3,
    src_col: str = "source_value",
    dst_col: str = "target_value",
) -> DataFrame:
    """Directed BFS: (node, hop) for every node reachable from
    `start` in ≤ max_hops, hop = length of the shortest path.

    Level-synchronous: the frontier of hop h joins the edge table
    once; an anti-join against the visited set dedups, which also
    makes first-visit == min-hop.
    """
    spark = edges.sparkSession
    # the deduped edge table is touched once per hop: persist it so
    # only hop 1 pays the distinct shuffle (it unpersists on return)
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .distinct()
        .persist()
    )
    from nucliadb_spark.functions import frames

    frontier = frames.literal_frame(spark, [(start, 0)], "node string, hop int")
    visited = frontier
    try:
        for h in range(1, max_hops + 1):
            # frontier/visited are small (node sets): eager checkpoint
            # both truncates lineage AND prevents recomputation of
            # earlier hops by take(1)/union/next-join
            nxt = (
                e.join(F.broadcast(frontier), e["a"] == frontier["node"])
                .select(F.col("b").alias("node"), F.lit(h).alias("hop"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if not nxt.take(1):
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return visited.orderBy("hop", "node")
    finally:
        e.unpersist()


def bfs_reachability_sql(
    edges_sql: str,
    start: str,
    max_hops: int = 3,
    src_col: str = "source_value",
    dst_col: str = "target_value",
) -> str:
    """Recursive-CTE twin: UNION-dedup on (node, hop) bounds the
    expansion; MIN(hop) per node equals BFS first-visit depth."""
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT {src_col} AS a, {dst_col} AS b FROM ({edges_sql})
),
reach(node, hop) AS (
  SELECT '{start}' AS node, 0 AS hop
  UNION
  SELECT e.b, reach.hop + 1
  FROM reach JOIN e ON e.a = reach.node
  WHERE reach.hop < {max_hops}
)
SELECT node, MIN(hop) AS hop
FROM reach
GROUP BY node
ORDER BY hop, node
"""


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every node in the undirected pair graph;
    cluster_id = min node id of the component (min-label propagation
    to fixpoint). The dedup-pipeline step after lsh_pairs/
    simhash_pairs: keep one doc per cluster_id, drop the rest."""
    e = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .take(1)
        )
        labels = new_labels
        if not changed:
            break
    return labels.select(
        F.col("node").alias("id"), F.col("label").alias("cluster_id")
    ).orderBy("id")


def connected_components_sql(
    pairs_sql: str, a_col: str = "id_a", b_col: str = "id_b"
) -> str:
    """Recursive-CTE twin: per-node reachable set (UNION-dedup
    terminates on cycles), min reachable id = component label."""
    return f"""
WITH RECURSIVE p AS ({pairs_sql}),
e AS (
  SELECT {a_col} AS a, {b_col} AS b FROM p
  UNION
  SELECT {b_col} AS a, {a_col} AS b FROM p
),
reach(src, node) AS (
  SELECT a AS src, a AS node FROM e GROUP BY a
  UNION
  SELECT reach.src, e.b
  FROM reach JOIN e ON e.a = reach.node
)
SELECT src AS id, MIN(node) AS cluster_id
FROM reach
GROUP BY src
ORDER BY id
"""


def graph_adjacency(
    edges: DataFrame,
    src_col: str = "source_value",
    dst_col: str = "target_value",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(e, nodes, outdeg) — the deduped directed edge table, the node
    set and the out-degree table: GRAPH-INDEX artifacts (every graph
    engine maintains adjacency + degrees next to the triple store, the
    way tantivy keeps a term dictionary next to postings). Exposed so
    serving paths can build them once per session (cached_df) instead
    of paying the three distinct/agg shuffles per query — the r14
    baseline profile measured graph_pagerank re-deriving these every
    run (33 jobs / 823 tasks; guide §2.4: remove shuffles outright)."""
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).distinct()
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    out = e.groupBy("a").agg(F.count("*").cast("double").alias("deg"))
    return e, nodes, out


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    top_k: int = 20,
    src_col: str = "source_value",
    dst_col: str = "target_value",
    adjacency: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    n_nodes: float | None = None,
) -> DataFrame:
    """(node, pagerank) — top_k nodes by PageRank after a fixed
    number of power iterations over the directed relation graph.

    Uses the classic per-node formula pr'(v) = (1-d)/N + d·Σ_{u→v}
    pr(u)/outdeg(u) WITHOUT dangling-mass redistribution (the GraphX
    staticPageRank convention — scores need not sum to 1). Each
    iteration's scores are rounded to 9 places so Spark's and the
    oracle's float summation order cannot drift across iterations;
    the output rounds to 5.

    adjacency/n_nodes: prebuilt (e, nodes, outdeg) index frames and
    the node count — the serving path passes session-cached ones
    (:func:`graph_adjacency`), so a query is ONLY the power
    iterations. Without them the adjacency is derived and persisted
    per call (the self-contained batch shape).

    Scale notes (r14 optimization): each iteration is ONE shuffle
    (the groupBy(target) contribution sum — rank and degree joins
    ride the same edge-keyed exchange, and AQE broadcasts the rank
    side while it is small). N is a driver-side index scalar, so the
    (1-d)/N term is a literal — the old per-iteration broadcast of a
    1-row aggregate and its crossJoins are gone.

    The iteration loop truncates lineage with a localCheckpoint per
    iteration. An earlier r14 attempt built ONE linear 3-iteration
    plan instead ("no driver-synchronized job per iteration") and it
    was measured 10x SLOWER (timed run 4.7 -> 62 s; summed task
    deserialization 36 -> 244 s across the headline sweep): the
    un-truncated plan re-nests every prior iteration under each AQE
    query stage, so task binaries, AQE replanning and broadcast
    subtree duplication grow super-linearly with iterations — the
    guide's §3.3 "materialise an intermediate to truncate the plan"
    case, re-proven empirically (plans/r14/graph_pagerank_after1.txt
    is the 6445-line linear plan; _after.txt is this shape)."""
    own = adjacency is None
    if own:
        e, nodes, out = graph_adjacency(edges, src_col, dst_col)
        e = e.persist()
        nodes = nodes.persist()
        out = out.persist()
    else:
        e, nodes, out = adjacency
    try:
        if n_nodes is None:
            n_nodes = nodes.count()
        n = F.lit(float(n_nodes))
        pr = nodes.select("node", (F.lit(1.0) / n).alias("pr"))
        for _ in range(iters):
            contrib = (
                e.join(out, "a")
                .join(pr, pr["node"] == e["a"])
                .groupBy(F.col("b").alias("tnode"))
                .agg(F.sum(F.col("pr") / F.col("deg")).alias("m"))
            )
            pr = (
                nodes.join(contrib, F.col("node") == F.col("tnode"), "left")
                .select(
                    "node",
                    F.round(
                        (F.lit(1.0) - F.lit(damping)) / n
                        + damping * F.coalesce("m", F.lit(0.0)),
                        9,
                    ).alias("pr"),
                )
                .localCheckpoint(eager=True)
            )
        return pr.select(
            "node", F.round("pr", 5).cast("double").alias("pagerank")
        ).orderBy(F.desc("pagerank"), "node").limit(top_k)
    finally:
        if own:
            e.unpersist()
            nodes.unpersist()
            out.unpersist()


def pagerank_sql(
    edges_sql: str,
    iters: int = 3,
    damping: float = 0.85,
    top_k: int = 20,
    src_col: str = "source_value",
    dst_col: str = "target_value",
) -> str:
    """Unrolled twin: one CTE per power iteration (recursive CTEs
    forbid the aggregation each step needs, so a FIXED iteration
    count unrolls honestly).

    Every shared CTE carries a MATERIALIZED hint: DuckDB inlines
    CTEs by default, so without the hints pr{iters} expands to ~k
    concurrent copies of the DISTINCT-edges subtree — the r10
    driver-box OOM shape. Materialized, each iteration reads one
    small (node, pr) table (200MB-cap tested at sf0.01)."""
    base = f"""
WITH rel AS ({edges_sql}),
e AS MATERIALIZED (SELECT DISTINCT {src_col} AS a, {dst_col} AS b FROM rel),
nodes AS MATERIALIZED (SELECT a AS node FROM e UNION SELECT b FROM e),
nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT a, COUNT(*)::DOUBLE AS deg FROM e GROUP BY a),
pr0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    for k in range(1, iters + 1):
        base += f""",
pr{k} AS MATERIALIZED (
  SELECT nodes.node,
         ROUND((1.0 - {damping}) / nn.n
               + {damping} * COALESCE(s.m, 0.0), 9) AS pr
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT e.b AS node, SUM(p.pr / o.deg) AS m
    FROM e JOIN pr{k - 1} p ON p.node = e.a
           JOIN outdeg o ON o.a = e.a
    GROUP BY e.b
  ) s ON s.node = nodes.node
)"""
    return base + f"""
SELECT node, ROUND(pr, 5)::DOUBLE AS pagerank
FROM pr{iters}
ORDER BY pagerank DESC, node
LIMIT {top_k}
"""
