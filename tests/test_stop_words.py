"""Port of the reference's stop-word removal test table
(nidx/nidx_paragraph/src/query_parser.rs:122-181) — the ASCII cases
our shared tokenizer represents identically."""

from nucliadb_spark.functions.text import tokenize_py
from nucliadb_spark.operators.bm25 import remove_stop_words


def _clean(query: str) -> str:
    return " ".join(remove_stop_words(tokenize_py(query)))


def test_stop_word_removal_ported_cases():
    cases = [
        (
            "nuclia is a database for unstructured data",
            "nuclia database unstructured data",
        ),
        # keeps last term even if a stop word
        ("nuclia is a database for the", "nuclia database the"),
        ("is a for and", "and"),
        ("what does stop is?", "stop is"),
        ("How can I learn to make a flat white?", "learn make flat white"),
        ("i pistacchi siciliani sono i migliori al mondo",
         "pistacchi siciliani migliori mondo"),
        ("", ""),
    ]
    for query, expected in cases:
        assert _clean(query) == expected, query


# --- T8 highlight offsets point at the real substrings ---------------------


def test_highlight_offsets_point_at_terms(spark, sf_dir):
    from pyspark.sql import functions as F

    from nucliadb_spark.operators import bm25
    from nucliadb_spark.sources import tpch

    fields = tpch.fields(spark, sf_dir)
    hits = bm25.bm25_search(fields, "query filter agg", top_k=5, with_ematches=True)
    out = bm25.highlight_offsets(hits, fields)
    rows = out.join(
        fields.select("rid", "text"), "rid"
    ).collect()
    assert rows
    for r in rows:
        assert r.highlights
        for span in r.highlights.split(";"):
            term, rng = span.split("@")
            start, end = map(int, rng.split("-"))
            assert r.text[start:end] == term, (term, start, end, r.text[start:end])
            # whole-word: neighbors are separators or string edges
            assert start == 0 or not r.text[start - 1].isalnum()
            assert end == len(r.text) or not r.text[end].isalnum()
