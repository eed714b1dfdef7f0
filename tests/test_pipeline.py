"""Pipeline-level parity tests on the tiny corpus (pandas oracle)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest


def test_engines_agree(spark, tiny_frames):
    """Catalyst parse engine == pandas parse engine, row for row."""
    from otlp_cardinality_checker_spark.operators.parse import parse_turns

    transcripts, _, _ = tiny_frames
    df = spark.createDataFrame(transcripts)
    cols = ["conv_id", "turn_idx", "severity_inferred", "template", "attrs"]
    a = parse_turns(df, engine="sql").select(cols).toPandas()
    b = parse_turns(df, engine="pandas").select(cols).toPandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a["severity_inferred"].tolist() == b["severity_inferred"].tolist()
    assert a["template"].tolist() == b["template"].tolist()
    assert [sorted(d.items()) for d in a["attrs"]] == [
        sorted(d.items()) for d in b["attrs"]
    ]


def test_parse_matches_generation_truth(spark, tiny_frames):
    from otlp_cardinality_checker_spark.operators.parse import parse_turns

    transcripts, truth, _ = tiny_frames
    df = spark.createDataFrame(transcripts)
    got = (
        parse_turns(df)
        .select("conv_id", "turn_idx", "severity_inferred", "template")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = truth.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["severity_inferred"].tolist() == exp["severity_inferred"].tolist()
    assert got["template"].tolist() == exp["template"].tolist()


def test_routing_is_exhaustive_and_disjoint(tiny_routed, tiny_frames):
    transcripts, _, _ = tiny_frames
    counts = {
        r["sink"]: r["n"]
        for r in tiny_routed.groupBy("sink").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == len(transcripts)
    # every tool turn routed to tool_call
    n_tool = int(transcripts["tool"].notna().sum())
    assert counts["tool_call"] == n_tool


def test_routing_predicates(tiny_routed):
    bad = tiny_routed.where(
        ((F.col("sink") == "tool_call") & F.col("tool").isNull())
        | ((F.col("sink") == "error") & (F.col("severity") != "ERROR"))
        | (
            (F.col("sink") == "chat")
            & ((F.col("severity") == "ERROR") | F.col("tool").isNotNull())
        )
    ).count()
    assert bad == 0


def test_missing_dim_row_null_semantics(tiny_routed):
    """`system` is absent from the tiny role_dim: left join must keep rows."""
    sys_rows = tiny_routed.where(F.col("role") == "system")
    assert sys_rows.count() > 0
    assert sys_rows.where(F.col("role_class").isNotNull()).count() == 0
    assert (
        sys_rows.where(F.col("service") != "unknown_service").count() == 0
    )
    # severity default missing -> UNSET rows stay UNSET
    assert (
        sys_rows.where(
            (F.col("severity_inferred") == "UNSET")
            & (F.col("severity") != "UNSET")
        ).count()
        == 0
    )


def test_per_turn_text_equality_roundtrip(spark, tiny_routed, tmp_path):
    """FIXTURES.md §4: sinks read back ordered == original text bytes."""
    from otlp_cardinality_checker_spark.operators.route import write_sinks

    paths = write_sinks(tiny_routed, str(tmp_path), n_buckets=4)
    frames = []
    for p in paths.values():
        frames.append(
            spark.read.parquet(p).select("conv_id", "turn_idx", "text").toPandas()
        )
    got = (
        pd.concat(frames)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    orig = (
        tiny_routed.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == orig["text"].tolist()


def test_key_stats_vs_pandas_oracle(tiny_routed, tiny_frames):
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats

    transcripts, truth, truth_attrs = tiny_frames
    got = key_stats(tiny_routed, exact=True).toPandas()

    routed_pd = tiny_routed.select("conv_id", "turn_idx", "sink").toPandas()
    attrs = truth_attrs.merge(routed_pd, on=["conv_id", "turn_idx"])
    exp = (
        attrs.groupby(["sink", "key"])
        .agg(count=("value", "size"), est_cardinality=("value", "nunique"))
        .reset_index()
    )
    merged = got.merge(exp, on=["sink", "key"], suffixes=("", "_exp"))
    assert len(merged) == len(exp) == len(got)
    assert (merged["count"] == merged["count_exp"]).all()
    assert (merged["est_cardinality"] == merged["est_cardinality_exp"]).all()


def test_hll_within_tolerance(tiny_routed):
    """HLL mode within 10% of exact (reference hll_test.go:240-267 band)."""
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats

    exact = {
        (r["sink"], r["key"]): r["est_cardinality"]
        for r in key_stats(tiny_routed, exact=True).collect()
    }
    approx = key_stats(tiny_routed, exact=False).collect()
    assert len(approx) == len(exact)
    for r in approx:
        e = exact[(r["sink"], r["key"])]
        assert abs(r["est_cardinality"] - e) <= max(1, 0.1 * e)


def test_sample_cap_and_sorting(tiny_routed):
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats

    for r in key_stats(tiny_routed, exact=True).collect():
        samples = r["value_samples"].split("|") if r["value_samples"] else []
        assert len(samples) <= 10
        assert samples == sorted(samples)


def test_salted_hll_equals_unsalted(tiny_routed):
    """Two-stage salted agg must give the same estimates as 1-salt agg."""
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats

    a = {
        (r["sink"], r["key"]): r["est_cardinality"]
        for r in key_stats(tiny_routed, exact=False, n_salt=16).collect()
    }
    b = {
        (r["sink"], r["key"]): r["est_cardinality"]
        for r in key_stats(tiny_routed, exact=False, n_salt=1).collect()
    }
    assert a == b



def test_jsonl_source_parity_and_quarantine(spark, tmp_path):
    """JSONL ingest: well-formed lines parse byte-identically to the
    parquet source (fingerprint-verified), malformed lines are captured
    in _corrupt_record instead of failing the read."""
    import pyspark.sql.functions as F

    from otlp_cardinality_checker_spark.operators.checksum import (
        dataset_fingerprint,
    )
    from otlp_cardinality_checker_spark.sources.transcripts import (
        load_transcripts,
        load_transcripts_jsonl,
    )

    # deterministic sample: an unordered limit() would re-select different
    # rows on each of the two actions below (write, then fingerprint)
    pq = (
        load_transcripts(spark, "/root/testdata/sf0.001")
        .orderBy("conv_id", "turn_idx")
        .limit(200)
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    jdir = tmp_path / "jsonl"
    (
        pq.select(*cols)
        .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .coalesce(1)
        .write.json(str(jdir))
    )
    # drop one malformed line in as its own file (appending to a part file
    # would invalidate its Hadoop .crc sidecar and fail the read outright)
    (jdir / "extra.json").write_text(
        '{"conv_id": "broken", "turn_idx": NOT_JSON}\n'
    )

    from otlp_cardinality_checker_spark.sources.transcripts import (
        split_jsonl_quarantine,
    )

    good, bad = split_jsonl_quarantine(
        load_transcripts_jsonl(spark, str(jdir))
    )
    good = good.select(*cols)
    assert bad.count() == 1

    # multiset equality via the portable fingerprint (ts second-truncated
    # on both sides: the JSON roundtrip format carries second precision)
    canon = lambda df: df.withColumn(  # noqa: E731
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    fp = lambda df: dataset_fingerprint(canon(df)).collect()[0]  # noqa: E731
    a, b = fp(pq.select(*cols)), fp(good)
    assert (a["n_rows"], a["xor_digest"], a["sum_digest"]) == (
        b["n_rows"], b["xor_digest"], b["sum_digest"],
    )


def test_dataset_fingerprint_properties(spark):
    """Order/partitioning invariance; duplicate-pair sensitivity (the case
    xor alone cannot see); any value change flips the digest."""
    from otlp_cardinality_checker_spark.operators.checksum import (
        dataset_fingerprint,
    )

    rows = [(1, "a"), (2, "b"), (3, None)]
    df1 = spark.createDataFrame(rows, "id long, v string")
    df2 = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(7)
    f1 = dataset_fingerprint(df1).collect()[0]
    f2 = dataset_fingerprint(df2).collect()[0]
    assert tuple(f1) == tuple(f2)

    dup = spark.createDataFrame(rows + rows, "id long, v string")
    fd = dataset_fingerprint(dup).collect()[0]
    assert fd["xor_digest"] == 0 or fd["xor_digest"] != f1["xor_digest"]
    assert fd["sum_digest"] != f1["sum_digest"]  # sum catches xor-blind dups

    changed = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "x")], "id long, v string"
    )
    fc = dataset_fingerprint(changed).collect()[0]
    assert fc["xor_digest"] != f1["xor_digest"]


def test_export_sorted_ranges_are_disjoint(spark, tiny_routed, tmp_path):
    """export_sorted must produce files with disjoint conv_id ranges and
    sorted rows inside each file — the zone-map layout a 100 TB scan
    prunes on."""
    from pathlib import Path

    from otlp_cardinality_checker_spark.operators.route import export_sorted

    out = str(tmp_path / "sorted")
    export_sorted(
        tiny_routed.select("conv_id", "turn_idx", "text"), out, n_files=4
    )
    spans = []
    for f in sorted(Path(out).glob("part-*.parquet")):
        pdf = spark.read.parquet(str(f)).toPandas()
        if pdf.empty:
            continue
        keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
        assert keys == sorted(keys)  # sorted within the file
        spans.append((min(keys), max(keys)))
    assert len(spans) >= 2  # actually split into multiple ranges
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint (boundary keys may touch)
