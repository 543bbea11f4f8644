"""Registry entries: streaming ingest + event-time ops
(SURVEY §2.1 S1-S2, §2.12)."""

from __future__ import annotations

from nucliadb_spark.registry import register
from nucliadb_spark.sources import tpch
from nucliadb_spark.streaming import ingest


@register("stream_windowed_counts", ingest.windowed_event_counts_sql())
def stream_windowed_counts(spark, sf_dir):
    return ingest.windowed_event_counts(spark, sf_dir)


@register("event_sessionization", ingest.sessionize_sql())
def event_sessionization(spark, sf_dir):
    return ingest.sessionize(tpch.table(spark, sf_dir, "events"))


@register("stream_sessionization", ingest.sessionize_sql())
def stream_sessionization(spark, sf_dir):
    # custom stateful streaming operator (applyInPandasWithState);
    # a full availableNow drain equals the batch gap-sessionization,
    # so it shares the batch oracle
    return ingest.sessionize_stream(spark, sf_dir)
