"""Planted-semantics unit tests for the corpus-hygiene operators
(repetition signals, PII scan, contamination check, mixture
resampling, entities service). Oracle parity lives in
test_oracle_parity.py; these assert the *expected* values the
planting arithmetic implies, so a twin bug can't hide a wrong-both-
ways result."""

from __future__ import annotations

from pyspark.sql import functions as F

from nucliadb_spark.operators import contamination, entities, pii, textstats, trainset
from nucliadb_spark.sources import tpch


def _docs(spark, sf_dir):
    return tpch.table(spark, sf_dir, "documents")


# --- repetition signals -----------------------------------------------------


def test_repetition_stutter_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a a a"),  # pure stutter
            (2, "one two three four five six"),  # no repetition
            (3, "x y x y x y x y"),  # alternating: bigram-dominated
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in textstats.repetition_signals(df).collect()}
    assert rows[1]["consec_repeat_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 1.0 - 1.0 / 5  # one distinct of 5
    assert rows[2]["consec_repeat_frac"] == 0.0
    assert rows[2]["dup_bigram_frac"] == 0.0
    # "x y" appears 4x in 8 tokens -> covers 8/8 of tokens
    assert rows[3]["top_bigram_frac"] == 1.0
    assert rows[3]["consec_repeat_frac"] == 0.0


# --- PII --------------------------------------------------------------------


def test_pii_planted_counts(spark, sf_dir):
    out = pii.pii_scan(pii.plant_pii(_docs(spark, sf_dir)))
    rows = {r["id"]: r for r in out.collect()}
    # doc 0 is divisible by 7, 11 and 13 -> every kind planted
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1 and rows[0]["n_ips"] == 1
    assert rows[0]["has_pii"] == 1
    for did, r in rows.items():
        assert r["n_emails"] == (1 if did % 7 == 0 else 0), did
        assert r["n_phones"] == (1 if did % 11 == 0 else 0), did
        assert r["n_ips"] == (1 if did % 13 == 0 else 0), did
        assert "@" not in r["redacted"]
        if r["has_pii"]:
            assert (
                "<EMAIL>" in r["redacted"]
                or "<PHONE>" in r["redacted"]
                or "<IP>" in r["redacted"]
            )


def test_pii_redaction_preserves_clean_text(spark):
    df = spark.createDataFrame(
        [(1, "reach me at jane.doe@corp.io or 10.1.2.3 ok")],
        "doc_id long, text string",
    )
    r = pii.pii_scan(df).collect()[0]
    assert r["redacted"] == "reach me at <EMAIL> or <IP> ok"
    assert r["n_emails"] == 1 and r["n_ips"] == 1 and r["n_phones"] == 0


# --- contamination ----------------------------------------------------------


def test_contamination_flags_planted_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    train, ev = contamination.eval_split(docs)
    natural = {
        r["id"] for r in contamination.contamination_check(train, ev).collect()
    }
    out = contamination.contamination_check(
        contamination.plant_contamination(docs), ev
    ).collect()
    flagged = {r["id"] for r in out}
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    planted = {
        d
        for d in all_ids
        if d % contamination.PLANT_MOD == 0 and d % contamination.EVAL_MOD != 0
    }
    # every planted doc is caught; anything else flagged must be a
    # natural overlap (the generator reuses phrases, so a few exist)
    assert planted <= flagged
    assert flagged - planted <= natural
    assert all(r["n_hits"] >= 1 for r in out)


# --- mixture resampling -----------------------------------------------------


def test_mixture_hits_target_proportions(spark, sf_dir):
    targets = {"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125, "zh": 0.125}
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out = trainset.mixture_resample(docs, targets)
    got = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    orig = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # binding domain (largest count/target ratio deficit) survives whole
    binding = min(orig, key=lambda d: orig[d] / targets[d])
    assert got[binding] == orig[binding]
    # md5 bucketing is only approximately proportional at small n;
    # each domain must be within a loose band of its target share
    for lang, tgt in targets.items():
        assert abs(got[lang] / total - tgt) < 0.1, (lang, got[lang] / total, tgt)
    # deterministic: second run returns the identical id set
    ids1 = [r["id"] for r in out.collect()]
    ids2 = [r["id"] for r in trainset.mixture_resample(docs, targets).collect()]
    assert ids1 == ids2


# --- entities service -------------------------------------------------------


def test_entities_groups_roundtrip(spark, sf_dir):
    rel = tpch.relations(spark, sf_dir)
    groups = {r["egroup"]: r["n_entities"] for r in entities.entities_groups_summary(rel).collect()}
    assert set(groups) == {"PART", "SUPPLIER", "ORDER", "CUSTOMER"}
    members = entities.entities_group_members(rel, "SUPPLIER").collect()
    assert 0 < len(members) <= entities.GROUP_TOP_K
    assert all(m["value"].startswith("supplier:") for m in members)
    # the summary count and the member listing agree when under top_k
    if groups["SUPPLIER"] <= entities.GROUP_TOP_K:
        assert len(members) == groups["SUPPLIER"]


# --- unigram LM quality -----------------------------------------------------


def test_unigram_logprob_rare_scores_higher(spark):
    # "common" appears many times, "xyzzy"/"plugh" once each: the doc
    # made of rare tokens must be more surprising (higher neg logp).
    df = spark.createDataFrame(
        [(i, "common common common") for i in range(1, 9)]
        + [(9, "xyzzy plugh"), (10, "common common")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in textstats.unigram_logprob(df).collect()}
    assert rows[9]["avg_neg_logp"] > rows[1]["avg_neg_logp"]
    assert rows[1]["avg_neg_logp"] == rows[10]["avg_neg_logp"]  # same token mix
    assert rows[9]["n_tokens"] == 2


def test_unigram_model_probabilities_sum(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    model = {r["token"]: r["logp"] for r in textstats.unigram_model(df).collect()}
    # p(a)=2/5, p(b)=2/5, p(c)=1/5
    import math

    assert abs(model["a"] - math.log10(2 / 5)) < 1e-12
    assert abs(model["c"] - math.log10(1 / 5)) < 1e-12


# --- quality funnel ---------------------------------------------------------


def test_quality_funnel_planted(spark):
    healthy = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the quiet woods where it finds a stream of clear water"
    )
    df = spark.createDataFrame(
        [
            (1, "tiny"),  # too_short + low_stopword
            (2, healthy),  # passes everything
            (3, "zz " * 40),  # stutter + repetitive + low_stopword
        ],
        "doc_id long, text string",
    )
    rows = {r["rule"]: r for r in textstats.quality_funnel(df).collect()}
    assert rows["too_short"]["n_docs"] == 1  # doc 1 (4 chars)
    assert rows["pass_all"]["n_docs"] == 1
    assert rows["stutter"]["n_docs"] == 1
    # doc 3, plus doc 1: a 0-bigram doc has dup_bigram_frac 1.0
    # (degenerate-short docs are exactly what the funnel should cut)
    assert rows["repetitive"]["n_docs"] == 2
    assert abs(rows["pass_all"]["frac"] - 1 / 3) < 1e-4


# --- sequence packing -------------------------------------------------------


def test_pack_sequences_invariants(spark, sf_dir):
    out = trainset.pack_sequences(
        _docs(spark, sf_dir).select("doc_id", "text", "source"), seq_len=512
    ).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        offset = 0
        for r in rows:  # ordered by id within source
            assert r["start_offset"] == offset
            assert r["first_seq"] == offset // 512
            end = offset + r["n_tokens"]
            expect_last = max((end - 1) // 512, r["first_seq"])
            assert r["last_seq"] == expect_last
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1 >= 1
            offset = end


# --- IVF + SQ8 --------------------------------------------------------------


def test_ivf_sq8_matches_exact_ivf(spark, sf_dir):
    """SQ8 first pass + rerank inside the probed cells must agree
    with the full-precision IVF search on the same cells (rerank_top
    50 >> k 10, clusters well separated)."""
    from nucliadb_spark.operators import ann

    e = tpch.table(spark, sf_dir, "embeddings")
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qvec"))
    )
    exact = [r["id"] for r in ann.ivf_search_labeled(e, q, k=10, nprobe=2).collect()]
    sq8 = [
        r["id"]
        for r in ann.ivf_sq8_search_labeled(
            e, q, k=10, nprobe=2, rerank_top=1000
        ).collect()
    ]
    overlap = len(set(exact) & set(sq8))
    assert overlap >= 9, (exact, sq8)
