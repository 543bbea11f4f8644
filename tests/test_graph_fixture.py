"""Port of the reference's graph integration assertions
(nidx/nidx_relation/tests/test_graph_search.rs) onto the canonical
18-entity knowledge graph — same queries, same expected triples.
"""

import pytest
from pyspark.sql import functions as F

from nucliadb_spark.operators import filters as fx
from nucliadb_spark.operators import graph as G
from tests.fixtures import knowledge_graph


@pytest.fixture(scope="module")
def kg(spark):
    return knowledge_graph(spark).cache()


def _triples(df):
    return {
        (r.source_value, r.relation_label, r.target_value)
        for r in df.select("source_value", "relation_label", "target_value").collect()
    }


# --- test_graph_node_query (rs:129-203) ------------------------------------


def test_source_node_query(kg):
    # (:Anna)-[]->()
    out = _triples(G.path_search(kg, G.Node("Anna", side="source")))
    assert out == {
        ("Anna", "FOLLOW", "Erin"),
        ("Anna", "LIVE_IN", "New York"),
        ("Anna", "WORK_IN", "New York"),
        ("Anna", "LOVE", "Cat"),
    }


def test_subtype_query(kg):
    # (:PERSON)-[]->() — 12 paths
    q = fx.FieldEquals("source_subtype", "PERSON")
    assert G.path_search(kg, q, top_k=50).count() == 12


def test_destination_node_query(kg):
    # ()-[]->(:Anna:PERSON:ENTITY)
    q = G.Node("Anna", side="target", subtype="PERSON")
    assert _triples(G.path_search(kg, q)) == {("Anastasia", "IS_FRIEND", "Anna")}


def test_undirected_query(kg):
    # (:Anna) either direction — 5 paths
    q = G.Node("Anna", side="any", subtype="PERSON")
    out = _triples(G.path_search(kg, q))
    assert len(out) == 5
    assert ("Anastasia", "IS_FRIEND", "Anna") in out


# --- test_graph_node_exact_matches (rs:205-320) -----------------------------

MARGARET = {("Margaret", "WORK_IN", "Computer science")}


@pytest.mark.parametrize(
    "value,kind",
    [
        ("Computer science", "full"),
        ("Computer sci", "prefix"),
        ("Compu", "prefix"),
        ("Computer", "words"),
        ("science", "words"),
        ("sci", "prefix_words"),
    ],
)
def test_exact_match_kinds(kg, value, kind):
    q = G.Node(value, side="target", kind=kind)
    assert _triples(G.path_search(kg, q)) == MARGARET


# --- test_graph_fuzzy_node_query / fuzzy_matches (rs:322-470) ---------------


def test_fuzzy_prefix_source(kg):
    # (:~Anastas prefix)
    q = G.Node("Anastas", side="source", kind="fuzzy_prefix", subtype="PERSON")
    assert _triples(G.path_search(kg, q)) == {("Anastasia", "IS_FRIEND", "Anna")}


def test_fuzzy_full_two_typos_no_match(kg):
    q = G.Node("AnXstXsia", side="source", kind="fuzzy", subtype="PERSON")
    assert G.path_search(kg, q).count() == 0


def test_fuzzy_full_one_typo(kg):
    q = G.Node("AnXstasia", side="source", kind="fuzzy", subtype="PERSON")
    assert _triples(G.path_search(kg, q)) == {("Anastasia", "IS_FRIEND", "Anna")}


def test_fuzzy_prefix_matches_both_annas(kg):
    # (:^~Ana) matches Anna & Anastasia — 5 paths
    q = G.Node("Ana", side="source", kind="fuzzy_prefix", subtype="PERSON")
    out = _triples(G.path_search(kg, q))
    assert len(out) == 5
    assert ("Anastasia", "IS_FRIEND", "Anna") in out
    assert ("Anna", "LOVE", "Cat") in out


@pytest.mark.parametrize(
    "value,kind",
    [
        ("Computer scXence", "fuzzy"),
        ("CompuXer sci", "fuzzy_prefix"),
        ("CoXpu", "fuzzy_prefix"),
    ],
)
def test_fuzzy_match_kinds(kg, value, kind):
    q = G.Node(value, side="target", kind=kind)
    assert _triples(G.path_search(kg, q)) == MARGARET


# --- nodes / relations projections (rs:84-124) ------------------------------


def test_place_nodes_projection(kg):
    # destinations with subtype PLACE → {New York, UK}
    q = fx.FieldEquals("target_subtype", "PLACE")
    nodes = {
        r.value
        for r in G.nodes_projection(kg, q).filter(F.col("subtype") == "PLACE").collect()
    }
    assert nodes == {"New York", "UK"}


def test_alias_relation_projection(kg):
    q = G.Node("Mr. P", side="source")
    labels = [r.relation_label for r in G.relations_projection(kg, q).collect()]
    assert labels == ["ALIAS"]


# --- G7 strategy loop on the canonical KG ----------------------------------
# Ports the fuzzy_search_entities contract from the reference
# (graph_strategy.py:468-501: each query WORD fuzzy-matches any word
# of any node — "Rose Hamiltn" finds "Rosa Parks" and "Margaret
# Hamilton") and the hop-expansion shape of get_graph_results
# (graph_strategy.py:315-466).


def test_strategy_detects_entities_word_fuzzy(kg):
    # "Margart" (lev 1 of Margaret) + "Ana" (lev 1 of Anna): both
    # detected; word-position independent like the reference.
    got = {r.value for r in G.strategy_detect_entities(kg, "Margart Ana").collect()}
    assert "Margaret" in got
    assert "Anna" in got
    assert "Erin" not in got


def test_strategy_hop1_contains_frontier_relations(kg):
    out = G.strategy_search(kg, "Margart rocket", hops=1, top_k=20)
    triples = _triples(out)
    # hop 1 must include Margaret's own relations
    assert ("Margaret", "DEVELOPED", "Apollo") in triples
    assert ("Margaret", "WORK_IN", "Computer science") in triples
    # nothing beyond 1 hop of the detected set
    assert ("Tom", "CHASE", "Jerry") not in triples


def test_strategy_second_hop_expands_not_reexplores(kg):
    one = _triples(G.strategy_search(kg, "Margart", hops=1, top_k=20))
    two_df = G.strategy_search(kg, "Margart", hops=2, top_k=20).collect()
    two = {(r.source_value, r.relation_label, r.target_value): r.hop for r in two_df}
    # hop-2 reaches Apollo IS Rocket via the Apollo endpoint
    assert ("Apollo", "IS", "Rocket") in two
    assert two[("Apollo", "IS", "Rocket")] == 2
    # hop-1 triples keep hop=1 and their undecayed (higher) score
    for t in one:
        assert t in two and two[t] == 1
    scores = {
        (r.source_value, r.relation_label, r.target_value): r.score for r in two_df
    }
    # decay=0.5 bounds every hop-2 score at 0.5 (raw is in [0,1])
    assert max(s for t, s in scores.items() if two[t] == 2) <= 0.5
