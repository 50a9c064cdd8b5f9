"""Connected components vs a union-find oracle on random graphs."""

from __future__ import annotations

import numpy as np
import pytest

from bigtrees_spark import oracle
from bigtrees_spark.operators.cc import attach_labels, connected_components


def _random_edges(n_nodes: int, n_edges: int, seed: int):
    rng = np.random.default_rng(seed)
    return [
        (f"n{int(a):04d}", f"n{int(b):04d}")
        for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 30), (2, 200, 150), (3, 500, 700)])
@pytest.mark.parametrize(
    "driver_threshold,pre_contract",
    [(0, True), (0, False), (10**9, True)],
)  # distributed w/ and w/o the contraction seed; driver path
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges, driver_threshold, pre_contract):
    edges = _random_edges(n_nodes, n_edges, seed)
    df = spark.createDataFrame(edges, "url_l string, url_r string")
    got = {
        (r.url, r.cluster_id)
        for r in connected_components(
            df, driver_threshold=driver_threshold, pre_contract=pre_contract
        ).collect()
    }

    truth_df = oracle.clusters_from_pairs({(min(a, b), max(a, b)) for a, b in edges})
    truth = {(r.url, r.cluster_id) for r in truth_df.itertuples(index=False)}
    assert got == truth


def test_cc_pre_contract_fully_collapsing_graph(spark):
    """Disjoint twin pairs: the contraction resolves EVERY component, the
    residual graph is empty, and labels must still cover all nodes via the
    composition join (the defect the first experiment leg exposed)."""
    pairs = [(f"a{i:03d}", f"b{i:03d}") for i in range(50)]
    df = spark.createDataFrame(pairs, "url_l string, url_r string")
    got = {
        (r.url, r.cluster_id)
        for r in connected_components(df, driver_threshold=0, pre_contract=True).collect()
    }
    expect = {(a, a) for a, _ in pairs} | {(b, a) for a, b in pairs}
    assert got == expect


def test_cc_chain_and_star(spark):
    # long chain (worst case for naive propagation) + star + singleton pair
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(40)]
    star = [("s000", f"s{i:03d}") for i in range(1, 10)]
    df = spark.createDataFrame(chain + star, "url_l string, url_r string")
    labels = {r.url: r.cluster_id for r in connected_components(df).collect()}
    assert {labels[f"c{i:03d}"] for i in range(41)} == {"c000"}
    assert {labels[f"s{i:03d}"] for i in range(10)} == {"s000"}


def test_attach_labels_singletons(spark):
    docs = spark.createDataFrame([("a",), ("b",), ("c",)], "url string")
    labels = spark.createDataFrame([("b", "a"), ("a", "a")], "url string, cluster_id string")
    out = {(r.url, r.cluster_id) for r in attach_labels(docs, labels).collect()}
    assert out == {("a", "a"), ("b", "a"), ("c", "c")}


def test_cc_raises_without_fixpoint(spark):
    """Exhausting max_iter before the star fixpoint must RAISE: the label
    extraction assumes every edge is (node, root), so a non-fixpoint would
    silently split components."""
    path = [(f"p{i}", f"p{i+1}") for i in range(9)]  # 10-node path graph
    df = spark.createDataFrame(path, "url_l string, url_r string")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=1, driver_threshold=0, pre_contract=False)
