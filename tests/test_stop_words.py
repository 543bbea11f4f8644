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
