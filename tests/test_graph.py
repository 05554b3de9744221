"""Connected-components semantics: min-label determinism, chain
propagation (multi-round convergence), isolated vertices."""

from __future__ import annotations

from flink_streaming_twitter_spark.operators.graph import connected_components


def test_components_label_by_min_id_across_chains(spark):
    # chain 1-2-3-4 (diameter > 1 forces several propagation rounds),
    # pair 10-11, isolated 99
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)], ["id"])
    out = {r.id: r.comp for r in connected_components(edges, nodes=nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_components_without_node_table_covers_edge_endpoints(spark):
    edges = spark.createDataFrame([(5, 6), (6, 7)], ["src", "dst"])
    out = {r.id: r.comp for r in connected_components(edges).collect()}
    assert out == {5: 5, 6: 5, 7: 5}
