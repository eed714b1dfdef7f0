"""Exact heavy hitters: MG superset property, exactness, partition invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from otlp_cardinality_checker_spark.operators.heavy_hitters import heavy_hitters


def _zipf_rows(n=5000, seed=7):
    rng = random.Random(seed)
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            vals.append("hot_a")
        elif r < 0.48:
            vals.append("hot_b")
        elif r < 0.60:
            vals.append("hot_c")
        else:
            vals.append(f"tail_{rng.randrange(800)}")
    return vals


def _exact(spark_df, column, k):
    n = spark_df.where(F.col(column).isNotNull()).count()
    return {
        (r[0], r[1])
        for r in spark_df.where(F.col(column).isNotNull())
        .groupBy(column)
        .count()
        .where(F.col("count") * k > n)
        .collect()
    }


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_exact_vs_full_groupby_any_partitioning(spark, parts):
    df = spark.createDataFrame(
        [(v,) for v in _zipf_rows()], "v string"
    ).repartition(parts)
    for k in (3, 10, 50):
        got = {(r["value"], r["count"]) for r in heavy_hitters(df, "v", k).collect()}
        assert got == _exact(df, "v", k), (parts, k)


def test_adversarial_sorted_partitioning(spark):
    # all copies of each hot value land in ONE partition (range layout):
    # the averaging argument still guarantees candidacy there
    df = (
        spark.createDataFrame([(v,) for v in sorted(_zipf_rows())], "v string")
        .repartitionByRange(8, "v")
    )
    got = {(r["value"], r["count"]) for r in heavy_hitters(df, "v", 5).collect()}
    assert got == _exact(df, "v", 5)


def test_share_and_order(spark):
    df = spark.createDataFrame(
        [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10, "v string"
    )
    rows = heavy_hitters(df, "v", 4).collect()
    assert [r["value"] for r in rows] == ["a", "b"]  # c: 10*4 == 100, not >
    assert rows[0]["share"] == 0.6 and rows[1]["share"] == 0.3


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [(None,)] * 92, "v string"
    )
    rows = heavy_hitters(df, "v", 2).collect()
    # n excludes nulls: a has 8 of 8 non-null rows -> share 1.0
    assert len(rows) == 1 and rows[0]["share"] == 1.0


def test_numeric_column(spark):
    df = spark.createDataFrame([(1,)] * 50 + [(2,)] * 30 + [(3,)] * 20, "v long")
    rows = heavy_hitters(df, "v", 3).collect()
    assert [(r["value"], r["count"]) for r in rows] == [(1, 50)]


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", 1)


def test_candidate_set_is_bounded(spark):
    """The MG stage must emit <= k values per partition — the bounded-memory
    claim, checked on a high-cardinality uniform column (worst case)."""
    from otlp_cardinality_checker_spark.operators.heavy_hitters import (
        _mg_partition,
    )

    df = (
        spark.range(20000)
        .select(F.concat(F.lit("u"), (F.col("id") % 5000)).alias("v"))
        .repartition(4)
    )
    k = 16
    cand = df.mapInPandas(_mg_partition("v", k), schema="v string")
    per_part = (
        cand.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    # uniform data can legally empty the summary entirely (every counter
    # decremented to zero) — None means zero candidates
    assert (per_part or 0) <= k
    # and the end-to-end answer on uniform data is exactly the empty set
    assert heavy_hitters(df, "v", k).count() == 0
