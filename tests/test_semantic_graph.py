"""Vector (semantic) graph search over node + edge embeddings.

Port of nidx/tests/integration/vector_relation_index.rs
test_relation_path_search: animals graph, query vector [0.6,0.8,0,0],
node/edge vectorsets, min_score 0.7 both — expects exactly the paths
(lion bigger-than dog) > (dog bigger-than fish) > (lion eats fish),
top score > 1.5 (node + node + edge components summed).
"""

from nucliadb_spark.operators import graph as G

Q = [0.6, 0.8, 0.0, 0.0]


def _fixture(spark):
    relations = spark.createDataFrame(
        [
            ("dog", "bigger than", "fish"),
            ("fish", "faster than", "snail"),
            ("lion", "bigger than", "dog"),
            ("lion", "eats", "fish"),
        ],
        "source_value string, relation_label string, target_value string",
    )
    node_vecs = spark.createDataFrame(
        [
            ("dog", [0.7, 0.7, 0.0, 0.0]),
            ("fish", [0.0, 0.0, 0.7, 0.7]),
            ("snail", [0.0, 0.7, 0.7, 0.0]),
            ("lion", [0.58, 0.58, 0.0, 0.58]),
        ],
        "value string, vector array<double>",
    )
    edge_vecs = spark.createDataFrame(
        [
            ("bigger than", [0.6, 0.6, 0.2, 0.0]),
            ("faster than", [0.7, 0.7, 0.0, 0.0]),
            ("eats", [0.0, 0.0, 0.8, 0.3]),
        ],
        "label string, vector array<double>",
    )
    query = spark.createDataFrame([(Q,)], "qvec array<double>")
    return relations, node_vecs, edge_vecs, query


def test_relation_path_search_port(spark):
    relations, node_vecs, edge_vecs, query = _fixture(spark)
    res = G.semantic_path_search(
        relations, node_vecs, edge_vecs, query, min_node=0.7, min_edge=0.7
    ).collect()
    paths = [(r.source_value, r.relation_label, r.target_value) for r in res]
    assert paths == [
        ("lion", "bigger than", "dog"),
        ("dog", "bigger than", "fish"),
        ("lion", "eats", "fish"),
    ]
    scores = [r.score for r in res]
    assert scores[0] > 1.5  # both endpoints + edge matched
    assert scores[0] > scores[1] > scores[2]


def test_node_set_respects_min_score(spark):
    relations, node_vecs, edge_vecs, query = _fixture(spark)
    # raising the node threshold above lion's ~0.81 leaves only
    # dog-endpoint paths
    res = G.semantic_path_search(
        relations, node_vecs, edge_vecs, query, min_node=0.9, min_edge=0.7
    ).collect()
    for r in res:
        assert "dog" in (r.source_value, r.target_value)
