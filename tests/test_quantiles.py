"""Mergeable quantile sketch: error bounds, exact merge, plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_estimates_bound_exact_quantiles(spark):
    """The estimate is the containing bucket's UPPER bound: never below
    the exact quantile, and < 25% above it (octave-quarter buckets)."""
    from otlp_cardinality_checker_spark.operators.quantiles import (
        quantile_sketch,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qs = (0.5, 0.9, 0.99)
    est = {
        (r["lang"], r["q"]): r["estimate"]
        for r in quantile_sketch(docs, "n_chars", qs, "lang").collect()
    }
    # exact quantile at the same rank definition: value at rank ceil(q*n)
    exact_rows = docs.groupBy("lang").agg(
        F.sort_array(F.collect_list("n_chars")).alias("vals")
    ).collect()
    import math

    for r in exact_rows:
        vals = r["vals"]
        for q in qs:
            exact = vals[math.ceil(q * len(vals)) - 1]
            e = est[(r["lang"], q)]
            assert e >= exact, (r["lang"], q, e, exact)
            assert e <= exact * 1.25 + 1, (r["lang"], q, e, exact)


def test_merge_is_exact(spark):
    """sketch(A) ⊎ sketch(B) == sketch(A ∪ B) — additive, order-free,
    the property that makes daily partials mergeable without raw data."""
    from otlp_cardinality_checker_spark.operators.quantiles import (
        merge_partials,
        quantile_partials,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    merged = merge_partials(
        quantile_partials(a, "n_chars", "lang"),
        quantile_partials(b, "n_chars", "lang"),
    )
    full = quantile_partials(docs, "n_chars", "lang")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_bucket_arithmetic_hand_cases(spark):
    from otlp_cardinality_checker_spark.operators.quantiles import (
        quantile_partials,
    )

    rows = [(1, v) for v in (1, 7, 8, 9, 100, 1023, 1024, 0, -5)]
    df = spark.createDataFrame(rows, "g int, v long")
    got = {
        r["bucket_hi"]: r["cnt"]
        for r in quantile_partials(df, "v", "g").collect()
    }
    # v<8: exact buckets (hi = v+1); v=8,9 -> sub=4 -> hi=10;
    # 100: bl=7, shift=4, sub=6, hi=112; 1023: bl=10, sub=7, hi=1024;
    # 1024: bl=11, sub=4, hi=1280; 0 and -5 clamp to 1 -> hi=2
    assert got[2] == 3  # v=1 plus the two clamped values
    assert got[8] == 1  # v=7
    assert got[10] == 2  # v=8, 9
    assert got[112] == 1
    assert got[1024] == 1
    assert got[1280] == 1


def test_partials_plan_single_exchange(spark):
    """The sketch build is ONE shuffle (map-side combined hash-agg);
    anything more is a scale regression."""
    from otlp_cardinality_checker_spark.operators.quantiles import (
        quantile_partials,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        quantile_partials(docs, "n_chars", "lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_quantile_stream_equals_batch_and_replay_safe(spark, tmp_path):
    """Streamed partials merged over micro-batches == the batch sketch
    bit-for-bit, and a full checkpoint-wiped replay (same batch splits,
    repeated batch ids) leaves the merged state unchanged — dynamic
    partition overwrite makes each batch's partial idempotent."""
    from otlp_cardinality_checker_spark.operators.quantiles import (
        quantile_sketch,
    )
    from otlp_cardinality_checker_spark.streaming.stream import (
        current_quantiles,
        quantile_stream,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
    pdf = docs.toPandas()
    n = len(pdf)
    src = tmp_path / "src"
    src.mkdir()
    for i, lo in enumerate(range(0, n, n // 3 + 1)):
        pdf.iloc[lo : lo + n // 3 + 1].to_parquet(
            src / f"part{i}.parquet", index=False
        )

    n_batches = quantile_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert n_batches >= 2  # actually exercised the merge across batches
    streamed = sorted(
        tuple(r)
        for r in current_quantiles(spark, str(tmp_path / "out")).collect()
    )
    batch = sorted(
        tuple(r)
        for r in quantile_sketch(
            docs, "n_chars", (0.5, 0.9, 0.99), "lang"
        ).collect()
    )
    assert streamed == batch

    # replay: wipe the checkpoint so every batch re-runs with the same ids
    import shutil

    shutil.rmtree(tmp_path / "ckpt")
    quantile_stream(
        spark, str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    replayed = sorted(
        tuple(r)
        for r in current_quantiles(spark, str(tmp_path / "out")).collect()
    )
    assert replayed == batch
