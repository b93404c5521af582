"""Connected-components dedup clustering (large-star/small-star)."""

import random

import pytest
from pyspark.sql import functions as F

from planetiler_openmaptiles_spark.textops.cluster import (
    cluster_sizes,
    connected_components,
    dedup_by_clusters,
)


def _uf_components(edges):
    """Reference union-find over python tuples → {node: min-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), []).append(n)
    return {n: min(members) for members in groups.values() for n in members}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _uf_components(edges)
    return got


def test_two_components(spark):
    _run(spark, [("b", "a"), ("c", "b"), ("x", "y")])


def test_long_chain_beats_diameter(spark):
    # a path of 40 nodes: naive label propagation needs ~40 rounds; the
    # star alternation must converge well inside max_iter=50 regardless
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(40)]
    got = _run(spark, edges)
    assert set(got.values()) == {"n00"}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = [f"d{i:03d}" for i in range(60)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(45)]
    _run(spark, edges)


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _run(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])
    assert got == {"a": "a", "b": "a"}


def test_cluster_sizes_and_dedup(spark):
    edges = [("b", "a"), ("c", "b"), ("y", "x")]
    edf = spark.createDataFrame(edges, "doc_a string, doc_b string")
    comps = connected_components(edf)
    sizes = {r["component"]: r["n_members"] for r in cluster_sizes(comps).collect()}
    assert sizes == {"a": 3, "x": 2}

    docs = spark.createDataFrame(
        [(d, f"text {d}") for d in ["a", "b", "c", "x", "y", "z"]],
        "doc_id string, text string",
    )
    kept = sorted(r["doc_id"] for r in dedup_by_clusters(docs, edf).collect())
    # one representative (min id) per cluster + the untouched singleton z
    assert kept == ["a", "x", "z"]
