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
