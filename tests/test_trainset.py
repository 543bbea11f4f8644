"""Hand-built-expectation tests for the trainset generators and the
time-series operators — independent of the DuckDB oracle (which runs
the same spec; these rows are computed by hand)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from nucliadb_spark.operators import timeseries, trainset


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_join_hand_case(spark):
    rows = [
        # user 1: click@10:00, click@10:30, purchase@10:45, purchase@10:10
        Row(event_id=1, ts=_ts("2024-01-01 10:00:00"), user_id=1, event_type="click", value=1.0),
        Row(event_id=2, ts=_ts("2024-01-01 10:30:00"), user_id=1, event_type="click", value=1.0),
        Row(event_id=3, ts=_ts("2024-01-01 10:45:00"), user_id=1, event_type="purchase", value=9.0),
        Row(event_id=4, ts=_ts("2024-01-01 10:10:00"), user_id=1, event_type="purchase", value=5.0),
        # user 2: purchase with NO prior click (left-join null), view ignored
        Row(event_id=5, ts=_ts("2024-01-01 09:00:00"), user_id=2, event_type="view", value=0.0),
        Row(event_id=6, ts=_ts("2024-01-01 09:30:00"), user_id=2, event_type="purchase", value=3.0),
        Row(event_id=7, ts=_ts("2024-01-01 09:40:00"), user_id=2, event_type="click", value=1.0),
    ]
    out = {
        r["event_id"]: (r["right_event_id"], r["gap_us"])
        for r in timeseries.asof_join(spark.createDataFrame(rows)).collect()
    }
    assert out[3] == (2, 15 * 60 * 1_000_000)  # latest prior click wins
    assert out[4] == (1, 10 * 60 * 1_000_000)  # earlier purchase → earlier click
    assert out[6] == (None, None)  # no prior click: left-join semantics


def test_rollup_grains(spark):
    rows = [
        Row(ts=_ts("2024-01-01 01:00:00"), event_type="click", value=1.0),
        Row(ts=_ts("2024-01-01 02:00:00"), event_type="view", value=2.0),
        Row(ts=_ts("2024-01-02 01:00:00"), event_type="click", value=4.0),
    ]
    out = timeseries.rollup_counts(spark.createDataFrame(rows)).collect()
    by_key = {(r["day"], r["event_type"]): (r["grain"], r["n_events"], r["total_value"]) for r in out}
    assert by_key[("2024-01-01", "click")] == (0, 1, 1.0)
    assert by_key[("2024-01-01", "ALL")] == (1, 2, 3.0)
    assert by_key[("ALL", "ALL")] == (3, 3, 7.0)
    assert ("ALL", "click") not in by_key  # rollup, not cube


def test_token_classification_tags(spark):
    fields = spark.createDataFrame(
        [Row(rid=1, field_key="/t/body", text="the spark Table runs")]
    )
    r = trainset.token_classification(fields).collect()[0]
    assert r["tokens"] == "the spark table runs"
    assert r["tags"] == "O B-TECH B-OBJECT O"


def test_sentences_cover_paragraph_exactly(spark):
    paras = spark.createDataFrame(
        [Row(rid=1, paragraph_id="1/0-130", start=0, end=130, text="x" * 130)]
    )
    out = trainset.sentences(paras).orderBy("sentence_id").collect()
    # stride 60 over 130 chars → windows [0,60) [60,120) [120,130)
    assert [r["sentence_id"] for r in out] == [
        "1/0-130/0-60",
        "1/0-130/120-130",
        "1/0-130/60-120",
    ]
    assert sum(len(r["text"]) for r in out) == 130


def test_stratified_sample_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "zh") for i in range(200)]
    )
    a = {r["doc_id"] for r in trainset.stratified_sample(docs, {"en": 50, "zh": 10}).collect()}
    b = {r["doc_id"] for r in trainset.stratified_sample(docs, {"en": 50, "zh": 10}).collect()}
    assert a == b  # reproducible across runs
    en = sum(1 for d in a if d % 2)
    zh = len(a) - en
    assert 30 <= en <= 70 and 0 <= zh <= 25  # rates roughly honored


def test_connected_components_transitive_chain(spark):
    # A~B, B~C, D~E: two components even though A≁C directly
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=10, id_b=11)]
    )
    from nucliadb_spark.operators.iterative import connected_components

    out = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_bfs_min_hop(spark):
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("b", "c"), ("s", "b")],
        "source_value string, target_value string",
    )
    from nucliadb_spark.operators.iterative import bfs_reachability

    out = {r["node"]: r["hop"] for r in bfs_reachability(edges, "s", max_hops=3).collect()}
    # b is reachable via a (2 hops) AND directly (1 hop) → min wins
    assert out == {"s": 0, "a": 1, "b": 1, "c": 2}


def test_rollover_roundtrip(spark, sf_dir, tmp_path):
    from nucliadb_spark.operators import shards
    from nucliadb_spark.sources import tpch

    res = tpch.resources(spark, sf_dir).select("rid", "title")
    path = str(tmp_path / "rollover")
    shards.write_sharded(res, path, n_shards=6)
    new = shards.read_sharded(spark, path)
    v = shards.validate_rollover(res, new)
    assert v["missing"] == 0 and v["invented"] == 0 and v["duplicated"] == 0
    assert v["n"] == res.count()
    assert new.select("shard").distinct().count() == 6
    # partition pruning: a single-shard read touches one directory
    one = spark.read.parquet(path).filter("shard = 3")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() > 0


def test_rebalance_moves_invariants():
    from nucliadb_spark.operators.shards import rebalance_moves

    sizes = {0: 100, 1: 10, 2: 55, 3: 3, 4: 32}
    moves = rebalance_moves(dict(sizes))
    after = dict(sizes)
    for frm, to, n in moves:
        assert n > 0 and frm != to
        after[frm] -= n
        after[to] += n
    assert sum(after.values()) == sum(sizes.values())  # conservation
    assert max(after.values()) - min(after.values()) <= 1  # balanced
    assert rebalance_moves(dict(sizes)) == moves  # deterministic
    assert rebalance_moves({0: 5, 1: 5}) == []  # already balanced


def test_shard_sizes_matches_rollover_plan(spark, sf_dir):
    from nucliadb_spark.operators import shards
    from nucliadb_spark.sources import tpch

    res = tpch.resources(spark, sf_dir).select("rid")
    sizes = {
        r["shard"]: r["n_resources"]
        for r in shards.shard_sizes(res, 4, epoch=0).collect()
    }
    plan = shards.rollover_plan(res, n_old=4, n_new=6).collect()
    from collections import defaultdict

    by_old = defaultdict(int)
    for r in plan:
        by_old[r["old_shard"]] += r["n_resources"]
    assert dict(by_old) == sizes  # the movement matrix partitions each old shard


def test_repeated_in_field_flag(spark):
    # synthetic paragraphs with an exact within-rid repeat
    rows = [
        Row(rid=1, paragraph_id="1/0-5", start=0, end=5, text="hello", kind="TITLE"),
        Row(rid=1, paragraph_id="1/5-10", start=5, end=10, text="hello", kind="TEXT"),
        Row(rid=1, paragraph_id="1/10-15", start=10, end=15, text="world", kind="TEXT"),
        Row(rid=2, paragraph_id="2/0-5", start=0, end=5, text="hello", kind="TITLE"),
    ]
    from nucliadb_spark.sources.tpch import flag_repeats

    flagged = flag_repeats(spark.createDataFrame(rows))
    out = {r["paragraph_id"]: r["repeated_in_field"] for r in flagged.collect()}
    # first occurrence per (rid, text) keeps 0; the within-rid repeat
    # is flagged; the same text in ANOTHER rid is NOT a repeat
    assert out == {"1/0-5": 0, "1/5-10": 1, "1/10-15": 0, "2/0-5": 0}


def test_asof_join_tolerance(spark):
    rows = [
        Row(event_id=1, ts=_ts("2024-01-01 10:00:00"), user_id=1, event_type="click", value=1.0),
        Row(event_id=2, ts=_ts("2024-01-01 12:00:00"), user_id=1, event_type="purchase", value=9.0),
        Row(event_id=3, ts=_ts("2024-01-01 12:30:00"), user_id=1, event_type="purchase", value=9.0),
    ]
    out = {
        r["event_id"]: r["right_event_id"]
        for r in timeseries.asof_join(
            spark.createDataFrame(rows), tolerance_us=120 * 60 * 1_000_000
        ).collect()
    }
    assert out[2] == 1  # exactly 2h back: tolerance is inclusive
    assert out[3] is None  # 2.5h back: match dropped by tolerance


def test_label_alias_translation():
    from nucliadb_spark.functions.labels import (
        translate_alias_to_system_label,
        translate_system_to_alias_label,
    )

    assert translate_alias_to_system_label("/classification.labels/type/x") == "/l/type/x"
    assert translate_alias_to_system_label("/metadata.status/PROCESSED") == "/n/s/PROCESSED"
    assert translate_alias_to_system_label("/l/already/system") == "/l/already/system"
    assert translate_system_to_alias_label("/n/s/PROCESSED") == "/metadata.status/PROCESSED"
    assert translate_system_to_alias_label("/l/type/x") == "/classification.labels/type/x"


def test_detect_entities_stub():
    from nucliadb_spark.functions.models import detect_entity_values_py

    assert detect_entity_values_py("spark part:3 and part:17 supplier:5x order:") == [
        "part:17",
        "part:3",
    ]
    assert detect_entity_values_py("no entities here") == []


def test_fold_diacritics_three_way(spark):
    import duckdb

    from nucliadb_spark.functions.text import (
        fold_diacritics,
        fold_diacritics_py,
        fold_diacritics_sql,
    )

    samples = ["José Ñoño CAFÉ", "Žluťoučký kůň", "customér:19", "ASCII only", "ß stays"]
    py = [fold_diacritics_py(s) for s in samples]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, s string")
    sp = [r["o"] for r in df.select("i", fold_diacritics("s").alias("o")).orderBy("i").collect()]
    con = duckdb.connect()
    dk = [con.execute(f"SELECT {fold_diacritics_sql('?')}", [s]).fetchone()[0] for s in samples]
    assert sp == py == dk
    assert py[0] == "jose nono cafe"


def test_multi_kb_per_tenant_stats(spark, sf_dir):
    """The same document must score DIFFERENTLY inside its KB than in
    the global corpus — per-tenant index stats, not a post-filter."""
    from nucliadb_spark.operators import bm25
    from nucliadb_spark.operators.filters import FieldEquals
    from nucliadb_spark.sources import tpch

    f = tpch.fields_multi_kb(spark, sf_dir)
    scoped = bm25.bm25_search(
        f, "spark join window", top_k=50, prefilter=FieldEquals("kbid", "kb1")
    ).collect()
    glob = bm25.bm25_search(f, "spark join window", top_k=200).collect()
    assert all(r["rid"] % 2 == 1 for r in scoped)  # isolation
    g = {r["rid"]: r["score"] for r in glob}
    diffs = [r for r in scoped if r["rid"] in g and r["score"] != g[r["rid"]]]
    assert diffs, "scoped scores identical to global — stats are not per-KB"


def test_bpe_first_merge_hand_case(spark):
    """Corpus 'low low low lower' → the dominant pairs are 'l,o' and
    'o,w' (4 each); tie broken lexicographically so row 1 is (l,o).
    'w,</w>' appears 3 times (the 'lower' token ends in r,</w>)."""
    docs = spark.createDataFrame([("low low low lower",)], "text string")
    rows = trainset.bpe_pair_counts(docs, top_k=10).collect()
    got = {(r["left"], r["right"]): r["pair_count"] for r in rows}
    assert rows[0]["left"] == "l" and rows[0]["right"] == "o"
    assert got[("l", "o")] == 4 and got[("o", "w")] == 4
    assert got[("w", "</w>")] == 3 and got[("r", "</w>")] == 1


def test_dsir_prefers_target_vocabulary(spark):
    """Docs sharing the target domain's vocabulary must outrank docs
    that don't — the whole point of importance resampling."""
    rows = [
        (1, "alpha beta gamma delta", "tgt"),
        (2, "alpha beta gamma epsilon", "tgt"),
        (3, "alpha beta gamma zeta", "raw"),      # target-like
        (4, "omega psi chi phi", "raw"),          # target-unlike
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {
        r["id"]: r["dsir_weight"]
        for r in trainset.dsir_weights(
            docs, target_col="source", target_value="tgt", top_k=10
        ).collect()
    }
    assert w[3] > w[4], w


def test_remove_dup_spans_keeper_keeps(spark):
    """The min-id doc keeps a duplicated span; the copy loses exactly
    the covered tokens; an untouched doc removes nothing."""
    from nucliadb_spark.operators import dedup

    span = "a b c d e f g h"  # one 8-gram
    rows = [
        (1, span + " unique1 tail1"),
        (2, span + " other2 words2"),     # shares only the 8-gram with doc 1
        (3, "totally different content"),
    ]
    corpus = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in dedup.remove_dup_spans(corpus, n=8).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    import hashlib

    assert out[2]["cleaned_md5"] == hashlib.md5(b"other2 words2").hexdigest()
    assert out[1]["cleaned_md5"] == hashlib.md5(
        b"a b c d e f g h unique1 tail1"
    ).hexdigest()


def test_pagerank_hand_case(spark):
    """Star graph a→c, b→c, c→d: d must outrank c, c must outrank the
    sources, and the sources tie (same in-degree structure)."""
    from nucliadb_spark.operators.iterative import pagerank

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")],
        "source_value string, target_value string",
    )
    pr = {r["node"]: r["pagerank"] for r in pagerank(edges, iters=3).collect()}
    assert pr["a"] == pr["b"]
    assert pr["c"] > pr["a"]
    assert pr["d"] > pr["a"]
    assert pr["d"] > pr["c"]


def test_rebalance_report_covers_empty_shards(spark):
    """A shard with zero items must appear in the report (n_items=0,
    role=taker) and the target divisor must be n_shards, not the
    observed-shard count — 5 rows over 13 shards leaves most shards
    empty, which the pre-r8 version silently dropped. Spark and the
    DuckDB twin must agree row-for-row."""
    import duckdb
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import shards

    df = spark.range(5).select(F.concat(F.lit("r"), F.col("id")).alias("rid"))
    rep = shards.rebalance_report(df, n_shards=13).toPandas()
    assert len(rep) == 13
    assert int(rep.target.sum()) == 5  # targets conserve the total
    assert int(rep.n_items.sum()) == 5
    assert (rep.loc[rep.n_items == 0, "role"] != "donor").all()
    # donors' surplus == takers' deficit (rows one pass would move)
    assert int(rep.loc[rep.surplus > 0, "surplus"].sum()) == -int(
        rep.loc[rep.surplus < 0, "surplus"].sum()
    )
    sql = shards.rebalance_report_sql(
        "SELECT 'r' || CAST(range AS VARCHAR) AS rid FROM range(5)", n_shards=13
    )
    d = duckdb.connect().execute(sql).fetchdf()
    for c in ["shard", "n_items", "target", "surplus", "role"]:
        assert list(rep[c]) == list(d[c]), c
