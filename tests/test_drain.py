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


def test_long_payload_collapses_to_one_cluster():
    """Reference miner_test.go TestLongPayloadClustering: long base64-ish
    payload tokens collapse to <*> at tokenization, so two messages whose
    blobs differ (even in token count via embedded spaces... same count
    here) land in the same length bucket and merge."""
    from otlp_cardinality_checker_spark.functions.drain import (
        DrainConfig,
        DrainMiner,
    )

    m = DrainMiner(DrainConfig(sim_threshold=0.7))
    blob1 = "CkwKCgjNstDNBhCA2QwQCxgBINAFKiRkOGNiZGFlYi04NGM1LTQ2MjgtODI5MC0wYTVkNzMwZDU2MzkwzuScgLDmBjgPQAJIwOC1NlgC"
    blob2 = "Ck0KCgjbstDNBhDAoAoQLRgCINAFKiQ5ZDMzMWY4NS0yNjRlLTRlYWMtYTVjYS0xMDM0Zjc2MTljYzYwkicgLDmBjgPQAJIt6eTvgdYAxLFBwiLsAEQ"
    t1 = m.add(f"Received message at offset 244486311 value {blob1} end")
    t2 = m.add(f"Received message at offset 244486358 value {blob2} end")
    assert len(m.clusters()) == 1
    assert "<*>" in t2
    assert t2.startswith("Received message at offset")


def test_lru_eviction_preserves_recent_clusters():
    """Reference TestLRUEvictionPreservesRecentClusters: re-touching a
    cluster updates recency; the oldest untouched cluster is evicted."""
    from otlp_cardinality_checker_spark.functions.drain import (
        DrainConfig,
        DrainMiner,
    )

    m = DrainMiner(DrainConfig(sim_threshold=0.99, max_clusters=3))
    m.add("aaa bbb ccc")
    m.add("ddd eee fff")
    m.add("ggg hhh iii")
    m.add("aaa bbb ccc")  # re-touch first
    m.add("jjj kkk lll")  # triggers eviction of oldest untouched
    templates = [t for t, _, _ in m.clusters()]
    assert len(templates) <= 3
    assert "aaa bbb ccc" in templates
    assert "ddd eee fff" not in templates


def test_match_is_read_only_inference():
    """Reference TestInferenceMode: known patterns match, unknown don't,
    and matching never creates clusters."""
    from otlp_cardinality_checker_spark.functions.drain import (
        DrainConfig,
        DrainMiner,
    )

    m = DrainMiner(DrainConfig(sim_threshold=0.5))
    m.add("user john logged in")
    m.add("user jane logged in")
    m.add("error connecting to database")
    n = len(m.clusters())
    template, ok = m.match("user bob logged in")
    assert ok and "user" in template and "logged" in template
    _, ok2 = m.match("totally new pattern here")
    assert not ok2
    assert len(m.clusters()) == n  # no mutation


def test_preload_then_match():
    from otlp_cardinality_checker_spark.functions.drain import (
        DrainConfig,
        DrainMiner,
    )

    m = DrainMiner(DrainConfig(sim_threshold=0.5))
    m.preload(["user <*> logged in", "error connecting to database"])
    t, ok = m.match("user zed logged in")
    assert ok and t == "user <*> logged in"


def test_sharded_drain_operator(spark, tiny_routed):
    """n_shards > 1: result is a union of independent shard cluster sets;
    every single-shard template count is preserved in total."""
    from otlp_cardinality_checker_spark.operators.templates import (
        drain_templates,
    )

    one = drain_templates(tiny_routed, n_shards=1)
    four = drain_templates(tiny_routed, n_shards=4)
    n1 = one.agg({"count": "sum"}).collect()[0][0]
    n4 = four.agg({"count": "sum"}).collect()[0][0]
    assert n1 == n4  # same messages mined, shard-partitioned
    # sharding can only split clusters, never lose or invent groups
    assert four.count() >= one.count()


def test_drain_infer_operator(spark, tiny_routed):
    from otlp_cardinality_checker_spark.operators.templates import (
        drain_infer,
        drain_templates,
    )

    model = drain_templates(tiny_routed)
    inferred = drain_infer(tiny_routed, model)
    total = tiny_routed.where("text is not null and trim(text) != ''").count()
    got = inferred.where("matched").count()
    # the model was trained on this exact corpus: everything non-empty matches
    assert got >= 0.95 * total
    assert inferred.where("matched and template is null").count() == 0
