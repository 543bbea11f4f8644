"""Shard management: rollover re-sharding + validation (SURVEY §2.1
S-layer ops; ref nucliadb/src/nucliadb/common/cluster/rollover.py —
create_rollover_shards:110, index_to_rollover_index:234,
cutover_shards:408, validate_indexed_data:459 — and rebalance.py).

The reference rolls a KB over to a fresh shard layout by re-indexing
every resource into new shards, cutting over, then validating counts.
The Spark-first analog of a "shard" is a partition directory keyed by
a deterministic routing hash; rollover is one repartition-by-routing
write, cutover is a path swap, and validation is a count/assignment
audit — all expressible as plain aggregations:

- routing is the portable md5 bucket (functions/text.md5_int60), so
  any engine (and the oracle) computes the identical placement;
- the movement plan (old_shard → new_shard matrix) is one groupBy —
  at 100 TB this is the map of how much data each executor pair
  ships, which is exactly what you review before running a rollover;
- `write_sharded` materializes the new layout partitioned by shard:
  partition pruning then serves per-shard queries (kbid/shard is the
  leading partition key, SCALE.md table layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nucliadb_spark.functions.text import md5_int60, md5_int60_sql


def shard_of(col, n_shards: int, epoch: int = 0):
    """Deterministic routing: md5-bucket of the rid, salted by the
    layout epoch so consecutive layouts decorrelate (a plain mod
    re-shard moves ~100% of rows; decorrelated hashing moves the
    unavoidable (1 - 1/n_new) fraction but never systematically)."""
    return (md5_int60(col.cast("string"), salt=f"shard{epoch}:") % n_shards).cast(
        "int"
    )


def shard_of_sql(expr: str, n_shards: int, epoch: int = 0) -> str:
    return (
        f"CAST({md5_int60_sql(f'CAST({expr} AS VARCHAR)', salt=f'shard{epoch}:')}"
        f" % {n_shards} AS INT)"
    )


def rollover_plan(
    resources: DataFrame,
    n_old: int,
    n_new: int,
    id_col: str = "rid",
) -> DataFrame:
    """(old_shard, new_shard, n_resources) movement matrix for
    rolling the corpus from an n_old-shard layout (epoch 0) to an
    n_new-shard layout (epoch 1). One narrow projection + one
    groupBy; map-side partial aggregation collapses each input
    partition to ≤ n_old·n_new rows before the shuffle."""
    rid = F.col(id_col)
    return (
        resources.select(
            shard_of(rid, n_old, epoch=0).alias("old_shard"),
            shard_of(rid, n_new, epoch=1).alias("new_shard"),
        )
        .groupBy("old_shard", "new_shard")
        .agg(F.count("*").cast("long").alias("n_resources"))
        .orderBy("old_shard", "new_shard")
    )


def rollover_plan_sql(
    resources_sql: str, n_old: int, n_new: int, id_col: str = "rid"
) -> str:
    return f"""
SELECT {shard_of_sql(id_col, n_old, epoch=0)} AS old_shard,
       {shard_of_sql(id_col, n_new, epoch=1)} AS new_shard,
       COUNT(*) AS n_resources
FROM ({resources_sql})
GROUP BY 1, 2
ORDER BY old_shard, new_shard
"""


def write_sharded(
    df: DataFrame, path: str, n_shards: int, id_col: str = "rid", epoch: int = 1
) -> None:
    """Materialize the rollover target layout: parquet partitioned by
    the routing shard (the index_to_rollover_index bulk phase as one
    partitioned write). Readers prune to single shards via the
    partition column."""
    df.withColumn("shard", shard_of(F.col(id_col), n_shards, epoch=epoch)).write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(path)


def read_sharded(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def validate_rollover(old: DataFrame, new: DataFrame, id_col: str = "rid") -> dict:
    """The validate_indexed_data:459 analog: every source row landed
    in the new layout exactly once, none invented. Two anti-joins +
    a dup check — returns counts (all must be zero except n)."""
    missing = old.select(id_col).join(new.select(id_col), id_col, "left_anti").count()
    invented = new.select(id_col).join(old.select(id_col), id_col, "left_anti").count()
    dups = (
        new.groupBy(id_col).count().filter(F.col("count") > 1).count()
    )
    return {
        "n": old.count(),
        "missing": missing,
        "invented": invented,
        "duplicated": dups,
    }


def shard_sizes(
    resources: DataFrame, n_shards: int, id_col: str = "rid", epoch: int = 0
) -> DataFrame:
    """(shard, n_resources) for the current layout — the input the
    rebalancer reviews (ref rebalance.py:70 get_rebalance_shards)."""
    return (
        resources.select(shard_of(F.col(id_col), n_shards, epoch=epoch).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_resources"))
        .orderBy("shard")
    )


def rebalance_moves(sizes: dict[int, int]) -> list[tuple[int, int, int]]:
    """Greedy move plan (from_shard, to_shard, n) evening shard sizes
    to within ±1 of the mean — the planner half of the reference's
    rebalance loop (rebalance.py:147-180 moves resources from shards
    over the size threshold into the smallest shards). Pure scalar
    planning on per-shard counts: runs on the driver by design, like
    every planner rule."""
    if not sizes:
        return []
    total = sum(sizes.values())
    n = len(sizes)
    base, extra = divmod(total, n)
    # targets: `extra` shards (lowest ids, deterministic) get base+1
    targets = {
        s: base + (1 if i < extra else 0)
        for i, s in enumerate(sorted(sizes))
    }
    donors = [(s, sizes[s] - targets[s]) for s in sorted(sizes) if sizes[s] > targets[s]]
    takers = [(s, targets[s] - sizes[s]) for s in sorted(sizes) if sizes[s] < targets[s]]
    moves: list[tuple[int, int, int]] = []
    di = ti = 0
    while di < len(donors) and ti < len(takers):
        d, dn = donors[di]
        t, tn = takers[ti]
        m = min(dn, tn)
        moves.append((d, t, m))
        dn -= m
        tn -= m
        donors[di] = (d, dn)
        takers[ti] = (t, tn)
        if dn == 0:
            di += 1
        if tn == 0:
            ti += 1
    return moves


def rebalance_report(
    items: DataFrame,
    n_shards: int,
    id_col: str = "rid",
    epoch: int = 0,
) -> DataFrame:
    """(shard, n_items, target, surplus, role) — the rebalancer's
    review table (ref rebalance.py:70-96 get_rebalance_shards +
    147-180 rebalance_shards: size every shard, then move paragraphs
    from shards above the threshold into the smallest ones).

    The deterministic target allocation matches `rebalance_moves`:
    total split as evenly as possible, the `total % n` lowest shard
    ids take one extra. role = donor (must shed), taker (must
    receive), balanced. Donors' surpluses and takers' deficits sum
    to the same number — the total rows a rebalance pass would move.

    The report covers ALL n_shards shards: a shard with zero items
    emits a row (n_items=0, role=taker) rather than vanishing —
    otherwise the divisor shrinks to the observed-shard count,
    inflating every target and hiding the neediest taker.

    Scale: one md5-bucket projection + one groupBy (map-side
    combined), then a left join against the n_shards-row shard
    sequence and window math over that ≤ n_shards-row report —
    the single-partition window is driver-sized by definition.
    """
    observed = (
        items.select(shard_of(F.col(id_col), n_shards, epoch=epoch).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_items"))
    )
    sizes = (
        items.sparkSession.range(n_shards)
        .select(F.col("id").cast("int").alias("shard"))
        .join(observed, "shard", "left")
        .select("shard", F.coalesce("n_items", F.lit(0)).cast("long").alias("n_items"))
    )
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("shard")
    total = F.sum("n_items").over(w_all)
    rank = F.row_number().over(w_ord)
    target = (total / n_shards).cast("long") + F.when(
        rank <= (total % n_shards).cast("long"), F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    return (
        sizes.select(
            "shard",
            "n_items",
            target.alias("target"),
        )
        .withColumn("surplus", (F.col("n_items") - F.col("target")).cast("long"))
        .withColumn(
            "role",
            F.when(F.col("surplus") > 0, "donor")
            .when(F.col("surplus") < 0, "taker")
            .otherwise("balanced"),
        )
        .orderBy("shard")
    )


def rebalance_report_sql(
    items_sql: str, n_shards: int, id_col: str = "rid", epoch: int = 0
) -> str:
    return f"""
WITH observed AS (
  SELECT {shard_of_sql(id_col, n_shards, epoch=epoch)} AS shard,
         CAST(COUNT(*) AS BIGINT) AS n_items
  FROM ({items_sql})
  GROUP BY 1
), sized AS (
  SELECT CAST(s.range AS INT) AS shard,
         CAST(COALESCE(o.n_items, 0) AS BIGINT) AS n_items
  FROM range({n_shards}) s
  LEFT JOIN observed o ON CAST(s.range AS INT) = o.shard
), alloc AS (
  SELECT shard, n_items,
         CAST(SUM(n_items) OVER () // {n_shards}
              + CASE WHEN ROW_NUMBER() OVER (ORDER BY shard)
                          <= SUM(n_items) OVER () % {n_shards}
                     THEN 1 ELSE 0 END AS BIGINT) AS target
  FROM sized
)
SELECT shard, n_items, target,
       CAST(n_items - target AS BIGINT) AS surplus,
       CASE WHEN n_items > target THEN 'donor'
            WHEN n_items < target THEN 'taker'
            ELSE 'balanced' END AS role
FROM alloc
ORDER BY shard
"""


def trainset_partitions(
    resources: DataFrame,
    n_shards: int,
    prefix: str | None = None,
    id_col: str = "rid",
) -> DataFrame:
    """`/kb/{kbid}/trainset[/{prefix}]` (train/api/v1/trainset.py:
    33-64): the partition keys a training client can stream from —
    in the reference these are the KB's shard ids (get_kb_partitions,
    optionally prefix-filtered); here each routing shard is one
    partition key, reported with its resource count so the client
    can size its readers. One narrow groupBy, ≤ n_shards rows."""
    p = (
        resources.select(shard_of(F.col(id_col), n_shards).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_resources"))
        .select(
            F.concat(F.lit("shard-"), F.col("shard")).alias("partition"),
            "n_resources",
        )
    )
    if prefix is not None:
        p = p.filter(F.col("partition").startswith(prefix))
    return p.orderBy("partition")


def trainset_partitions_sql(
    resources_sql: str, n_shards: int, prefix: str | None = None, id_col: str = "rid"
) -> str:
    # oracle-builder input: the prefix is interpolated into SQL, so
    # accept trusted shard-name constants only — never caller data
    if prefix is not None and ("'" in prefix or "\\" in prefix):
        raise ValueError(f"prefix must be a plain shard-name literal: {prefix!r}")
    where = (
        f"WHERE starts_with(partition, '{prefix}')" if prefix is not None else ""
    )
    return f"""
SELECT * FROM (
  SELECT concat('shard-', {shard_of_sql(id_col, n_shards, epoch=0)}) AS partition,
         COUNT(*) AS n_resources
  FROM ({resources_sql})
  GROUP BY 1
) {where}
ORDER BY partition
"""
