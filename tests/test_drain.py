"""Drain miner tests — behavioral contract from the reference's miner tests
(`pkg/autotemplate/miner_test.go` shapes, re-expressed for this impl)."""

from __future__ import annotations

from otlp_cardinality_checker_spark.functions.drain import DrainConfig, DrainMiner


def test_identical_messages_one_cluster():
    m = DrainMiner()
    for _ in range(5):
        m.add("connection established to backend")
    cs = m.clusters()
    assert len(cs) == 1
    assert cs[0] == ("connection established to backend", 5, "connection established to backend")


def test_variable_position_generalizes():
    m = DrainMiner()
    m.add("user alice logged in")
    m.add("user bob logged in")
    m.add("user carol logged in")
    cs = m.clusters()
    assert len(cs) == 1
    assert cs[0][0] == "user <*> logged in"
    assert cs[0][1] == 3


def test_different_lengths_different_clusters():
    m = DrainMiner()
    m.add("a b c")
    m.add("a b c d")
    assert len(m.clusters()) == 2


def test_similarity_threshold_splits_dissimilar():
    m = DrainMiner(DrainConfig(sim_threshold=0.6))
    m.add("alpha beta gamma delta")
    m.add("one two three four")
    assert len(m.clusters()) == 2


def test_inference_mode_no_new_clusters():
    m = DrainMiner()
    m.add("user alice logged in")
    out = m.add("user dave logged in", training=False)
    assert out == "user <*> logged in"
    assert len(m.clusters()) == 1
    out2 = m.add("completely different msg here", training=False)
    assert out2 == "completely different msg here"
    assert len(m.clusters()) == 1


def test_lru_eviction_cap():
    m = DrainMiner(DrainConfig(max_clusters=5))
    for i in range(10):
        m.add(f"unique{i} message variant structure {'x' * (i + 1)}")
    assert len(m.clusters()) <= 5


def test_digit_tokens_route_to_wildcard_child():
    # messages differing in a leading digit token still share a cluster
    m = DrainMiner()
    m.add("1234 records processed ok")
    m.add("5678 records processed ok")
    cs = m.clusters()
    assert len(cs) == 1
    assert cs[0][0] == "<*> records processed ok"


def test_drain_templates_operator(spark, tiny_routed):
    from otlp_cardinality_checker_spark.operators.templates import drain_templates

    got = drain_templates(tiny_routed).toPandas()
    assert {"role", "severity", "template", "count", "example"} <= set(got.columns)
    assert (got["count"] > 0).all()
    # per-group counts must sum to the non-empty-text row count
    import pyspark.sql.functions as F

    non_empty = tiny_routed.where(F.trim("text") != "").count()
    assert got["count"].sum() == non_empty
    # determinism: second run identical
    again = drain_templates(tiny_routed).toPandas()
    key = ["role", "severity", "template"]
    assert (
        got.sort_values(key).reset_index(drop=True)[key + ["count"]]
        .equals(again.sort_values(key).reset_index(drop=True)[key + ["count"]])
    )
