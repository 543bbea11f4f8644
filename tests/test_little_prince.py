"""Port of the reference's little_prince search behaviors
(nidx/nidx_tests/src/lib.rs:51-133 fixture; text/paragraph index
integration tests)."""

import pytest

from nucliadb_spark.operators import bm25, suggest
from tests.fixtures import little_prince


@pytest.fixture(scope="module")
def lp(spark):
    return little_prince(spark).cache()


def test_keyword_hits_both_fields(lp):
    out = bm25.bm25_search(lp, "prince", top_k=10, id_col="field_key")
    keys = [r.rid for r in out.collect()]
    assert set(keys) == {"/a/title", "/a/summary"}
    # title is shorter → higher BM25 for the same tf
    assert keys[0] == "/a/title"


def test_conjunctive_requires_all_terms(lp):
    out = bm25.bm25_search(lp, "little prince", top_k=10, mode="all", id_col="field_key")
    assert [r.rid for r in out.collect()] == ["/a/title"]


def test_phrase_match_title_only(lp):
    hits = lp.filter(bm25.phrase_match("text", "little prince")).collect()
    assert [r.field_key for r in hits] == ["/a/title"]


def test_fuzzy_one_typo(lp):
    out = bm25.bm25_search(lp, "prnce", top_k=10, fuzzy=True, id_col="field_key")
    assert {r.rid for r in out.collect()} == {"/a/title", "/a/summary"}


def test_suggest_prefix(lp):
    out = suggest.suggest_paragraphs(lp, "pri", id_col="field_key")
    assert out.count() == 2
