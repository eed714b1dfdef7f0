"""Connected-components (large-star/small-star) correctness tests."""

from __future__ import annotations

import random


def _union_find_labels(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label = min node id in component
    label = {}
    for x in range(n_nodes):
        r = find(x)
        label.setdefault(r, min(i for i in range(n_nodes) if find(i) == r))
    return {x: label[find(x)] for x in range(n_nodes)}


def _spark_labels(spark, edges):
    from otlp_cardinality_checker_spark.operators.graph import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_cc_matches_union_find_random(spark):
    rng = random.Random(42)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(u, v) for u, v in edges if u != v]
    truth = _union_find_labels(n, edges)
    got = _spark_labels(spark, edges)
    touched = {u for e in edges for u in e}
    assert set(got) == touched  # isolated nodes are the caller's job
    for node in touched:
        assert got[node] == truth[node], node


def test_cc_structures(spark):
    """Chain (worst case for naive propagation), clique, two components."""
    chain = [(i, i + 1) for i in range(40)]  # diameter 40
    clique = [(u, v) for u in range(100, 106) for v in range(100, u)]
    pair = [(500, 501)]
    got = _spark_labels(spark, chain + clique + pair)
    assert all(got[i] == 0 for i in range(41))
    assert all(got[i] == 100 for i in range(100, 106))
    assert got[500] == got[501] == 500


def test_jaccard_clusters_partition(spark):
    """Cluster ids partition the docs; survivors are cluster minima; sizes
    sum to the doc count; near-identical planted docs cluster together."""
    from otlp_cardinality_checker_spark.operators.graph import (
        jaccard_clusters,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base + f" tail{i}") for i in range(4)]  # near-dups of base
    rows += [(10 + i, f"completely different text number {i} about topic {i} stuff") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_clusters(docs, min_jaccard=0.3).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(got) == 7
    assert all(got[i]["cluster_id"] == 0 for i in range(4))
    assert got[0]["is_survivor"] == 1 and got[1]["is_survivor"] == 0
    assert got[0]["cluster_size"] == 4
    assert sum({r["cluster_id"]: r["cluster_size"] for r in out}.values()) == 7


def test_survivor_by_score_keeps_best_quality(spark):
    from otlp_cardinality_checker_spark.operators.graph import (
        survivor_by_score,
    )
    import pyspark.sql.functions as F

    clustered = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (9, 9, 1)],
        "doc_id long, cluster_id long, cluster_size long",
    ).withColumn("is_survivor", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
    scores = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (9, 7)], "doc_id long, score long"
    )
    got = {r["doc_id"]: r for r in survivor_by_score(clustered, scores).collect()}
    # doc 2 wins: max score, tie vs doc 3 broken by min id — NOT min-id doc 1
    assert [got[i]["is_survivor"] for i in (1, 2, 3)] == [0, 1, 0]
    assert got[9]["is_survivor"] == 1  # singleton keeps itself


def test_split_assignment_no_cross_split_leakage(spark):
    """Every near-dup cluster lands wholly in one split (the leakage-safety
    contract), membership matches an independent Python replay of the
    md5-threshold on the cluster id, and salt= gives an independent
    re-split that still never splits a cluster."""
    import hashlib

    from otlp_cardinality_checker_spark.operators.graph import (
        split_assignment,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base + f" tail{i}") for i in range(4)]  # one near-dup cluster
    rows += [
        (10 + i, f"completely different text number {i} about topic {i} stuff")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = split_assignment(docs, test_share=0.5, min_jaccard=0.3).collect()
    assert len(out) == 10
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        # independent replay of the split rule
        digest = hashlib.md5(str(r["cluster_id"]).encode()).hexdigest()[:4]
        want = "test" if digest < format(int(0.5 * 65536), "04x") else "train"
        assert r["split"] == want, (r["doc_id"], r["cluster_id"])
    # no cluster straddles the split — the whole point
    assert all(len(s) == 1 for s in by_cluster.values())
    # the planted 4-doc cluster moved as a unit
    four = [r for r in out if r["cluster_size"] == 4]
    assert len(four) == 4 and len({r["split"] for r in four}) == 1

    # a different salt is an independent draw, same leakage guarantee
    out2 = split_assignment(
        docs, test_share=0.5, min_jaccard=0.3, salt="v2"
    ).collect()
    by_cluster2 = {}
    for r in out2:
        by_cluster2.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster2.values())
    assert {r["doc_id"]: r["cluster_id"] for r in out} == {
        r["doc_id"]: r["cluster_id"] for r in out2
    }  # clustering itself is salt-independent


def test_cluster_size_hist_shape(spark):
    from otlp_cardinality_checker_spark.operators.graph import (
        cluster_size_hist,
    )

    rows = [
        (0, 0, 3), (1, 0, 3), (2, 0, 3),     # one 3-cluster
        (3, 3, 2), (4, 3, 2),                # one 2-cluster
        (5, 5, 1), (6, 6, 1), (7, 7, 1),     # three singletons
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, cluster_id long, cluster_size long"
    )
    got = {r["cluster_size"]: r for r in cluster_size_hist(df).collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_docs"] == 3
    assert got[2]["n_clusters"] == 1 and got[2]["n_docs"] == 2
    assert got[1]["n_clusters"] == 3 and got[1]["n_docs"] == 3
    assert abs(sum(r["doc_share"] for r in got.values()) - 1.0) <= 1e-5
