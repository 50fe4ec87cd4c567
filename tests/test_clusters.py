"""Transitive dedup clusters (connected components over near-dup pairs).

1. ``connected_components`` converges on graphs whose diameter exceeds any
   fixed round count (a 12-hop chain) — the library fixpoint mode;
2. the fixed-round mode used by the oracle-checked ``dedup_clusters``
   query is exact whenever rounds >= diameter, and equals the fixpoint;
3. ``dedup_clusters`` matches a hand union-find over the verified
   ``dedup_minhash_lsh`` pair graph.
"""

from __future__ import annotations

import pytest

from ocr_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _clear_cache(spark):
    yield
    spark.catalog.clearCache()


def _chain_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


def test_convergence_beats_fixed_rounds_on_long_chain(spark):
    # a 13-node path: diameter 12, so min-label propagation needs 12
    # rounds; 3 rounds must NOT finish, the fixpoint loop must
    edges = _chain_edges(spark, 12)
    converged = {
        r.doc_id: r.cluster_rep
        for r in dedup.connected_components(edges).collect()
    }
    assert converged == {i: 0 for i in range(13)}

    partial = {
        r.doc_id: r.cluster_rep
        for r in dedup.connected_components(edges, rounds=3).collect()
    }
    assert partial != converged
    assert partial[3] == 0 and partial[12] == 9  # exactly 3 hops propagated


def test_fixed_rounds_exact_within_diameter(spark):
    # two components (a triangle-ish pair cluster + a 4-path), diameter 3
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    fixed = sorted(
        map(tuple, dedup.connected_components(edges, rounds=dedup.CC_ROUNDS).collect())
    )
    fixpoint = sorted(map(tuple, dedup.connected_components(edges).collect()))
    assert fixed == fixpoint
    assert fixed == [
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    ]


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dedup_clusters_matches_union_find(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    ]
    assert pairs, "fixture must exercise at least one pair"
    expected = _union_find(pairs)
    got = {
        r.doc_id: r.cluster_rep
        for r in dedup.dedup_clusters(spark, SF_DIR).collect()
    }
    assert got == expected
