"""Feedback endpoint analog: append semantics + request validation
(ref: search/api/v1/feedback.py:34-70, nucliadb_models/search.py:
2136-2152)."""

import pytest

from nucliadb_spark.operators import feedback
from nucliadb_spark.sources import tpch


def test_send_feedback_appends_one_row(spark, sf_dir):
    log = feedback.feedback_log(tpch.table(spark, sf_dir, "events"))
    n = log.count()
    out = feedback.send_feedback(
        spark,
        log,
        kbid="kb0",
        user="user-x",
        req=feedback.FeedbackRequest(
            ident="learn-abc", good=False, feedback="wrong answer",
            text_block_id="7/p1",
        ),
        client_type="web",
    )
    assert out.count() == n + 1
    row = out.filter(out.ident == "learn-abc").collect()
    assert len(row) == 1
    r = row[0]
    assert (r.kbid, r.user, r.client_type) == ("kb0", "user-x", "web")
    assert r.good is False and r.task == "CHAT"
    assert r.feedback == "wrong answer" and r.text_block_id == "7/p1"
    # appended rows flow into the same report aggregation
    rep = feedback.kb_feedback_report(out)
    base = feedback.kb_feedback_report(log)
    got = {t.kbid: t.n_feedback for t in rep.collect()}
    want = {t.kbid: t.n_feedback for t in base.collect()}
    assert got["kb0"] == want["kb0"] + 1


def test_send_feedback_validation(spark, sf_dir):
    log = feedback.feedback_log(tpch.table(spark, sf_dir, "events"))
    with pytest.raises(ValueError, match="ident"):
        feedback.send_feedback(
            spark, log, "kb0", "u", feedback.FeedbackRequest(ident="", good=True)
        )
    with pytest.raises(ValueError, match="task"):
        feedback.send_feedback(
            spark, log, "kb0", "u",
            feedback.FeedbackRequest(ident="x", good=True, task="SEARCH"),
        )
    with pytest.raises(ValueError, match="client"):
        feedback.send_feedback(
            spark, log, "kb0", "u",
            feedback.FeedbackRequest(ident="x", good=True),
            client_type="fax",
        )


def test_feedback_log_shape(spark, sf_dir):
    """Negative records carry the detail; positive ones are bare —
    the audit-stream layout (audit/stream.py:597-627)."""
    log = feedback.feedback_log(tpch.table(spark, sf_dir, "events")).cache()
    bad = log.filter(~log.good)
    assert bad.count() > 0
    assert bad.filter(bad.feedback.isNull() | bad.text_block_id.isNull()).count() == 0
    good = log.filter(log.good)
    assert good.filter(good.feedback.isNotNull() | good.text_block_id.isNotNull()).count() == 0
    assert log.select("task").distinct().collect()[0].task == "CHAT"


def test_stream_feedback_rate_equals_batch(spark, sf_dir):
    """availableNow drain of the feedback stream == the batch
    aggregation over the same log (the stream==batch proof every
    streaming query here carries)."""
    from pyspark.sql import functions as F

    got = feedback.stream_feedback_rate(spark, sf_dir).collect()
    batch = (
        feedback.feedback_log(tpch.table(spark, sf_dir, "events"))
        .groupBy("kbid")
        .agg(
            F.count("*").alias("n_feedback"),
            F.count(F.when(F.col("good"), True)).alias("n_good"),
        )
        .withColumn(
            "good_rate",
            F.round(F.col("n_good") / F.col("n_feedback"), 4),
        )
        .orderBy("kbid")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]


def test_stream_feedback_trend_equals_batch(spark, sf_dir):
    """availableNow drain of the streaming day-rollup == the batch
    daily trend over the same log at the same tenant count — the
    incremental path computes the identical dashboard."""
    got = feedback.stream_feedback_trend(spark, sf_dir, tenants=4).collect()
    batch = feedback.feedback_daily_trend(
        feedback.feedback_log(tpch.table(spark, sf_dir, "events"), tenants=4)
    ).collect()
    assert len(got) > 0
    assert [tuple(r) for r in got] == [tuple(r) for r in batch]


def test_feedback_log_tenant_parameter(spark, sf_dir):
    """kbid cardinality follows the tenants parameter — the per-KB
    state claim ('one row per (kbid, task)') holds beyond 2 tenants."""
    for tenants in (2, 5):
        log = feedback.feedback_log(
            tpch.table(spark, sf_dir, "events"), tenants=tenants
        )
        kbs = {r.kbid for r in log.select("kbid").distinct().collect()}
        assert kbs == {f"kb{i}" for i in range(tenants)}
        rep = feedback.kb_feedback_report(log)
        assert rep.count() == tenants  # one row per (kbid, CHAT)


def test_stream_feedback_trend_equals_batch(spark, sf_dir):
    """Streaming drain of the per-(kbid, day) rollup == the batch
    daily-trend counts: the trend report is maintainable
    incrementally over the arriving audit stream, state bounded by
    tenants × days. (The cumulative-to-date column is a derived
    window over the drained state, so equality of the drained rollup
    is the whole proof.)"""
    import uuid

    from pyspark.sql import functions as F

    from nucliadb_spark.streaming.ingest import stage_arrival_dir

    src = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(src).schema
    arrival = stage_arrival_dir(src)
    name = f"fbtrend_{uuid.uuid4().hex[:10]}"
    log = feedback.feedback_log(
        spark.readStream.schema(schema).parquet(arrival), tenants=3
    )
    agg = log.groupBy(
        "kbid", F.col("event_ts").cast("date").cast("string").alias("day")
    ).agg(
        F.count("*").alias("n_feedback"),
        F.count(F.when(F.col("good"), True)).alias("n_good"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import shutil

    shutil.rmtree(arrival, ignore_errors=True)
    got = {
        (r.kbid, r.day): (r.n_feedback, r.n_good)
        for r in spark.table(name).collect()
    }
    batch = {
        (r.kbid, r.day): (r.n_feedback, r.n_good)
        for r in feedback.feedback_daily_trend(
            feedback.feedback_log(tpch.table(spark, sf_dir, "events"), tenants=3)
        ).collect()
    }
    assert got == batch and len(got) > 0
