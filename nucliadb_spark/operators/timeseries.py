"""Time-series operators over the events stream table — engine-added
capability (the reference has no event-time analytics; SURVEY §2.12
marks streaming as engine-added). Three classic shapes a 100 TB
training-data/telemetry pipeline needs:

- **as-of join**: attribute each event to the most recent prior event
  of another type for the same key. Spark lacks a native as-of join;
  the scale-correct composition is union → single window pass keyed by
  (user), NOT a range self-join: one shuffle on user_id, state bounded
  per partition, no candidate explosion. (A naive t1.ts >= t2.ts range
  join is O(n·m) per key and dies at 100 TB.)
- **multi-grain rollup**: one pass producing day×type, day, and grand
  totals via ROLLUP grouping sets (hypertable-style continuous
  aggregate shape) — partial aggregation map-side, one shuffle.
- **exact percentiles**: percentile_cont-equivalent per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every `left_type` event, the most recent strictly-prior
    `right_type` event by the same key.

    (event_id, user_id, ts, click_event_id, gap_us) — gap_us NULL when
    no prior right event exists (left join semantics). tolerance_us
    (pandas merge_asof-style): a prior match further back than the
    tolerance is treated as no match.

    Plan: filter to the two types (pushed to the scan), tag the right
    stream's id/ts into nullable columns, then one
    `last(..., ignorenulls=True)` window ordered by (ts, event_id)
    carries the latest right event forward within each key partition.
    Single shuffle on the key; window state is O(1) per row.
    """
    both = events.filter(F.col("event_type").isin(left_type, right_type))
    tagged = both.select(
        "event_id",
        key,
        "ts",
        "event_type",
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("_rid"),
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("_rts"),
    )
    # strictly-prior: exclude the current row from the carried window.
    w = (
        Window.partitionBy(key)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = tagged.select(
        "event_id",
        key,
        "ts",
        "event_type",
        F.last("_rid", ignorenulls=True).over(w).alias("right_event_id"),
        F.last("_rts", ignorenulls=True).over(w).alias("_prev_rts"),
    )
    gap = (F.unix_micros("ts") - F.unix_micros("_prev_rts")).cast("long")
    res = out.filter(F.col("event_type") == left_type).select(
        "event_id", key, "ts", "right_event_id", gap.alias("gap_us")
    )
    if tolerance_us is not None:
        in_tol = F.col("gap_us") <= tolerance_us
        res = res.select(
            "event_id",
            key,
            "ts",
            F.when(in_tol, F.col("right_event_id")).alias("right_event_id"),
            F.when(in_tol, F.col("gap_us")).alias("gap_us"),
        )
    return res.orderBy("event_id")


def asof_join_sql(
    events_sql: str,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
) -> str:
    """DuckDB twin via native ASOF LEFT JOIN — a genuinely independent
    implementation of the same semantics (DuckDB matches the greatest
    right ts satisfying the inequality)."""
    return f"""
WITH ev AS ({events_sql}),
lefts AS (SELECT event_id, {key}, ts FROM ev WHERE event_type = '{left_type}'),
rights AS (SELECT event_id AS right_event_id, {key}, ts AS rts
           FROM ev WHERE event_type = '{right_type}')
SELECT l.event_id AS event_id, l.{key} AS {key}, l.ts AS ts,
       r.right_event_id AS right_event_id,
       CAST(epoch_us(l.ts) - epoch_us(r.rts) AS BIGINT) AS gap_us
FROM lefts l ASOF LEFT JOIN rights r
  ON l.{key} = r.{key} AND l.ts > r.rts
ORDER BY l.event_id
"""


def rollup_counts(events: DataFrame) -> DataFrame:
    """Multi-grain rollup in one aggregation pass: (day, event_type),
    (day), and () grand total, distinguished by grouping level.
    Map-side partial aggregation handles the fan-in; one shuffle."""
    rolled = (
        events.select(F.to_date("ts").alias("day"), "event_type", "value")
        .rollup("day", "event_type")
        .agg(
            F.grouping_id().alias("grain"),
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).cast("double").alias("total_value"),
        )
    )
    # rolled-up cells are NULL — surface them as the explicit 'ALL'
    # marker so the output contract carries no NULL grouping keys
    return rolled.select(
        F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        "grain",
        "n_events",
        "total_value",
    ).orderBy("grain", "day", "event_type")


def rollup_counts_sql(events_sql: str) -> str:
    return f"""
WITH ev AS ({events_sql})
SELECT COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       GROUPING(CAST(ts AS DATE)) * 2 + GROUPING(event_type) AS grain,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4)::DOUBLE AS total_value
FROM ev
GROUP BY ROLLUP (CAST(ts AS DATE), event_type)
ORDER BY grain, day, event_type
"""


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact linear-interpolation percentiles of `value` per
    event_type (percentile_cont semantics; Spark's `percentile`
    matches DuckDB's quantile_cont bit-for-bit on doubles, rounded
    to 4 places for the output contract)."""
    pct = lambda p: F.round(F.expr(f"percentile(value, {p})"), 4).cast("double")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            pct(0.5).alias("p50"),
            pct(0.9).alias("p90"),
            pct(0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


def value_percentiles_sql(events_sql: str) -> str:
    return f"""
WITH ev AS ({events_sql})
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 4)::DOUBLE AS p50,
       ROUND(quantile_cont(value, 0.9), 4)::DOUBLE AS p90,
       ROUND(quantile_cont(value, 0.99), 4)::DOUBLE AS p99
FROM ev
GROUP BY event_type
ORDER BY event_type
"""
