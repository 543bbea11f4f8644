"""Port of the nidx integration suites (search_filtering.rs,
search_sorting.rs): the prefilter gates BOTH keyword and vector
retrievers, an empty prefilter empties every index, key-prefix
filters select fields, and date sorts order results."""

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import bm25, catalog, knn
from nucliadb_spark.operators import filters as fx


@pytest.fixture(scope="module")
def two_field_corpus(spark):
    """Two resources, one file field each — search_filtering.rs:104."""
    rows = [
        ("r1", "/f/field1", "r1/f/field1", "Dummy text field one", [1.0, 0.0, 0.0]),
        ("r2", "/f/field2", "r2/f/field2", "Dummy text field two", [0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows,
        "rid string, field_key string, full_key string, text string, vector array<float>",
    ).cache()


def _field_filter(names):
    return fx.Or([fx.FieldEquals("field_key", f"/f/{n}") for n in names])


def _search(corpus, names, qvec):
    pre = _field_filter(names)
    keyword = bm25.bm25_search(corpus, "dummy", top_k=10, prefilter=pre)
    q = corpus.sparkSession.createDataFrame([(qvec,)], "qvec array<float>")
    semantic = knn.exact_knn(
        corpus.filter(pre.to_column()), q, k=10, id_col="rid", min_score=None
    )
    return keyword.count(), semantic.count()


QVEC = [0.5, 0.5, 0.5]


def test_unexisting_field_empties_all_indexes(two_field_corpus):
    # PrefilterResult::None → no vector AND no paragraph results
    kw, sem = _search(two_field_corpus, ["foobar"], QVEC)
    assert (kw, sem) == (0, 0)


def test_single_field_filter(two_field_corpus):
    kw, sem = _search(two_field_corpus, ["field1", "unexisting"], QVEC)
    assert (kw, sem) == (1, 1)


def test_multi_field_filter_is_or(two_field_corpus):
    kw, sem = _search(two_field_corpus, ["field1", "field2"], QVEC)
    assert (kw, sem) == (2, 2)


# --- search_keyword_filtering.rs: keyword filters over field text -----------


def test_keyword_filter_combinations(two_field_corpus):
    # single keyword present in one field
    one = two_field_corpus.filter(fx.Keyword("one").to_column())
    assert one.count() == 1
    # AND of keywords from different fields → none
    both = two_field_corpus.filter(
        fx.And([fx.Keyword("one"), fx.Keyword("two")]).to_column()
    )
    assert both.count() == 0
    # OR spans both fields
    either = two_field_corpus.filter(
        fx.Or([fx.Keyword("one"), fx.Keyword("two")]).to_column()
    )
    assert either.count() == 2
    # NOT excludes the match
    not_one = two_field_corpus.filter(fx.Not(fx.Keyword("one")).to_column())
    assert not_one.count() == 1


# --- search_key_filtering.rs: resource / field-key prefix filters -----------


def test_key_prefix_filtering(two_field_corpus):
    # whole resource → its fields; specific field → just it
    all_r1 = two_field_corpus.filter(
        fx.PrefixMatch("full_key", "r1").to_column()
    )
    assert all_r1.count() == 1
    one = two_field_corpus.filter(
        fx.PrefixMatch("full_key", "r1/f/field1").to_column()
    )
    assert one.count() == 1
    none = two_field_corpus.filter(
        fx.PrefixMatch("full_key", "r3").to_column()
    )
    assert none.count() == 0


# --- search_sorting.rs: created/modified asc/desc ---------------------------


@pytest.fixture(scope="module")
def dated_corpus(spark):
    """20 dummy resources with created/modified stepping 1s apart and
    names sorting in time order — search_sorting.rs:28-70."""
    rows = [
        (
            f"dummy-{i:03d}",
            f"Dummy text {i:03d}",
            f"2024-01-01 00:00:{i:02d}",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "rid string, title string, created string")
    return df.withColumn("created", F.col("created").cast("timestamp")).withColumn(
        "modified", F.col("created")
    ).cache()


@pytest.mark.parametrize("col", ["created", "modified"])
@pytest.mark.parametrize("ascending", [True, False])
def test_date_sorting(dated_corpus, col, ascending):
    out = [
        r.rid
        for r in catalog.catalog_search(
            dated_corpus, sort_by=col, ascending=ascending, page_size=5
        ).collect()
    ]
    expected = sorted(out)
    if not ascending:
        expected = sorted(out, reverse=True)
    assert out == expected and len(out) == 5
    # ascending page starts at the oldest; descending at the newest
    assert out[0] == ("dummy-000" if ascending else "dummy-019")
