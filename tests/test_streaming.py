"""Streaming resume-equivalence test (FIXTURES.md §7).

Run (a) straight through vs (b) kill after the first micro-batch and resume
from checkpoint: all sinks must be byte-identical.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _read_all_sinks(spark, out_dir):
    frames = {}
    for sink in ("chat", "error", "tool_call"):
        pdf = (
            spark.read.parquet(f"{out_dir}/sink_{sink}")
            .drop("_batch_id")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        frames[sink] = pdf
    return frames


@pytest.mark.slow
def test_kill_resume_equivalence(spark, tmp_path):
    from otlp_cardinality_checker_spark.streaming.stream import (
        read_lineage,
        run_stream,
    )

    straight = tmp_path / "straight"
    resumed = tmp_path / "resumed"

    n_full = run_stream(
        spark, SF, str(straight / "out"), str(straight / "ckpt")
    )
    assert n_full >= 2, "fixture must produce multiple micro-batches"

    n_first = run_stream(
        spark,
        SF,
        str(resumed / "out"),
        str(resumed / "ckpt"),
        stop_after_batches=1,
    )
    assert n_first >= 1
    n_rest = run_stream(spark, SF, str(resumed / "out"), str(resumed / "ckpt"))
    assert n_rest >= 1

    a = _read_all_sinks(spark, str(straight / "out"))
    b = _read_all_sinks(spark, str(resumed / "out"))
    for sink in a:
        pd.testing.assert_frame_equal(a[sink], b[sink])

    lineage = read_lineage(str(resumed / "out"))
    assert {r["sink"] for r in lineage} == {"chat", "error", "tool_call"}
    total_routed = sum(r["n_rows"] for r in lineage)
    n_input = spark.read.parquet(
        f"{straight}/out/sink_chat"
    ).count() + spark.read.parquet(
        f"{straight}/out/sink_error"
    ).count() + spark.read.parquet(
        f"{straight}/out/sink_tool_call"
    ).count()
    assert total_routed == n_input
