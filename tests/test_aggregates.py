"""Aggregate-operator tests vs pandas oracles on the tiny corpus."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F


def test_service_stats(tiny_routed):
    from otlp_cardinality_checker_spark.operators.aggregate import service_stats

    got = service_stats(tiny_routed).toPandas()
    base = tiny_routed.select("sink", "role", "severity", "conv_id").toPandas()
    exp = (
        base.groupby(["sink", "role", "severity"])
        .agg(sample_count=("conv_id", "size"), n_conversations=("conv_id", "nunique"))
        .reset_index()
    )
    m = got.merge(exp, on=["sink", "role", "severity"], suffixes=("", "_e"))
    assert len(m) == len(exp) == len(got)
    assert (m["sample_count"] == m["sample_count_e"]).all()
    assert (m["n_conversations"] == m["n_conversations_e"]).all()


def test_template_stats_example_deterministic(tiny_routed):
    from otlp_cardinality_checker_spark.operators.aggregate import template_stats

    got = template_stats(tiny_routed).toPandas()
    base = tiny_routed.select(
        "role", "severity", "template", "text", "conv_id", "turn_idx"
    ).toPandas()
    base = base.sort_values(["conv_id", "turn_idx"])
    exp_example = base.groupby(["role", "severity", "template"]).first()["text"]
    for _, r in got.iterrows():
        assert r["example"] == exp_example[(r["role"], r["severity"], r["template"])]
    totals = base.groupby(["role", "severity"]).size()
    for _, r in got.iterrows():
        cnt = len(
            base[
                (base.role == r["role"])
                & (base.severity == r["severity"])
                & (base.template == r["template"])
            ]
        )
        assert r["count"] == cnt
        assert abs(r["pct"] - round(cnt * 100.0 / totals[(r["role"], r["severity"])], 4)) < 1e-9


def test_watched_values_exact(tiny_routed, tiny_frames):
    from otlp_cardinality_checker_spark.operators.aggregate import watched_values

    _, _, truth_attrs = tiny_frames
    got = watched_values(tiny_routed).toPandas()
    exp = (
        truth_attrs[truth_attrs.key.isin(["user_id", "tool_name"])]
        .groupby(["key", "value"])
        .size()
        .reset_index(name="count")
    )
    m = got.merge(exp, on=["key", "value"], suffixes=("", "_e"))
    assert len(m) == len(exp) == len(got)
    assert (m["count"] == m["count_e"]).all()
    assert not got["overflow"].any()


def test_watched_value_cap_and_overflow(spark):
    """Cap semantics: >cap uniques -> exactly cap rows kept + overflow flag
    (reference attribute.go:295-334)."""
    from otlp_cardinality_checker_spark.operators.aggregate import watched_values

    rows = [("tool_call", f"c{i}", 0, None, "user_id", f"v{i:05d}") for i in range(30)]
    df = spark.createDataFrame(
        rows, "sink string, conv_id string, turn_idx int, ts timestamp, key string, value string"
    )
    routed_like = df.select(
        "sink", "conv_id", "turn_idx", "ts",
        F.create_map(F.col("key"), F.col("value")).alias("attrs"),
    )
    got = watched_values(routed_like, watched_keys=("user_id",), cap=10).toPandas()
    assert len(got) == 10
    assert got["overflow"].all()


def test_active_series_fingerprint_grain(tiny_routed):
    from otlp_cardinality_checker_spark.operators.aggregate import active_series

    got = active_series(tiny_routed, exact=True).toPandas()
    assert set(got.columns) == {"sink", "active_series", "sample_count"}
    assert (got["active_series"] <= got["sample_count"]).all()
    assert (got["active_series"] > 0).all()


def test_complexity_and_high_cardinality(tiny_routed):
    from otlp_cardinality_checker_spark.operators.aggregate import (
        high_cardinality_keys,
        key_stats,
        metadata_complexity,
    )

    ks = key_stats(tiny_routed, exact=True)
    ks_pd = ks.toPandas()
    comp = metadata_complexity(ks, high_card_threshold=5).toPandas()
    for _, r in comp.iterrows():
        sub = ks_pd[ks_pd.sink == r["sink"]]
        assert r["total_keys"] == len(sub)
        assert r["max_cardinality"] == sub["est_cardinality"].max()
        assert r["high_card_count"] == (sub["est_cardinality"] >= 5).sum()
        assert r["complexity_score"] == len(sub) * sub["est_cardinality"].max()
    hc = high_cardinality_keys(ks, threshold=5, limit=3).toPandas()
    assert len(hc) <= 3
    assert (hc["est_cardinality"] >= 5).all()


def test_uid_cardinality_constant(spark):
    """FIXTURES.md: user_id ranges over exactly CARDINALITY_UID values at
    scale (mirrors reference test-hll-cardinality.sh: known constant)."""
    from otlp_cardinality_checker_spark.datagen import (
        EXPECTED_UID_CARDINALITY,
        generate_transcripts,
    )

    _, _, truth_attrs = generate_transcripts(5000)
    n_uid = truth_attrs[truth_attrs.key == "user_id"]["value"].nunique()
    assert n_uid == EXPECTED_UID_CARDINALITY
