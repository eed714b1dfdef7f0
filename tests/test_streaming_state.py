"""Streaming aggregate state + session persistence tests."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_streaming_state_equals_batch(spark, tmp_path):
    """Micro-batched mergeable state == one-shot batch aggregate (U1):
    counts exact, cardinality within HLL band, regardless of batch cuts."""
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats
    from otlp_cardinality_checker_spark.plans.pipeline import routed_turns
    from otlp_cardinality_checker_spark.streaming.stream import (
        current_key_stats,
        run_stream,
    )

    out = tmp_path / "out"
    n = run_stream(spark, SF, str(out), str(tmp_path / "ckpt"))
    assert n >= 2
    streamed = {
        (r["sink"], r["key"]): r for r in current_key_stats(spark, str(out)).collect()
    }
    batch = {
        (r["sink"], r["key"]): r
        for r in key_stats(routed_turns(spark, SF), exact=True).collect()
    }
    assert set(streamed) == set(batch)
    for k, b in batch.items():
        s = streamed[k]
        assert s["count"] == b["count"]
        exact_card = b["est_cardinality"]
        assert abs(s["est_cardinality"] - exact_card) <= max(1, 0.1 * exact_card)
        assert s["value_samples"] == b["value_samples"]


def test_session_save_load_merge_roundtrip(spark, tiny_routed, tmp_path):
    """S3/S4: snapshot -> parquet (binary sketches) -> load -> merge keeps
    counts exact and cardinality within band (serializer round-trip test,
    reference serializer_test.go:13-520 analogue)."""
    import pyspark.sql.functions as F

    from otlp_cardinality_checker_spark.operators.aggregate import key_stats
    from otlp_cardinality_checker_spark.operators.sessions import (
        estimate,
        load_session,
        merge_snapshots,
        save_session,
        snapshot_key_stats,
    )

    a = tiny_routed.where(F.col("turn_idx") < 5)
    b = tiny_routed.where(F.col("turn_idx") >= 5)
    save_session(snapshot_key_stats(a), str(tmp_path / "sess_a"))
    save_session(snapshot_key_stats(b), str(tmp_path / "sess_b"))

    merged = estimate(
        merge_snapshots(
            load_session(spark, str(tmp_path / "sess_a")),
            load_session(spark, str(tmp_path / "sess_b")),
        )
    ).toPandas()
    exact = key_stats(tiny_routed, exact=True).toPandas()
    m = merged.merge(exact, on=["sink", "key"], suffixes=("_m", "_e"))
    assert len(m) == len(exact) == len(merged)
    assert (m["count_m"] == m["count_e"]).all()
    assert (m["value_samples_m"] == m["value_samples_e"]).all()
    for _, r in m.iterrows():
        assert abs(r["est_cardinality_m"] - r["est_cardinality_e"]) <= max(
            1, 0.1 * r["est_cardinality_e"]
        )


@pytest.mark.slow
def test_state_compaction_and_replay_safety(spark, tmp_path):
    """compact_state folds per-batch partials behind a watermark: the
    merged view is unchanged by compaction, and a checkpoint replay that
    re-materializes an already-folded batch partition cannot double-count
    (partitions at or below the watermark are ignored on read)."""
    import shutil
    from pathlib import Path

    from otlp_cardinality_checker_spark.streaming.stream import (
        compact_state,
        current_key_stats,
        run_stream,
    )

    out = tmp_path / "out"
    n = run_stream(spark, SF, str(out), str(tmp_path / "ckpt"))
    assert n >= 2

    def snap():
        return sorted(
            tuple(r)
            for r in current_key_stats(spark, str(out))
            .select("sink", "key", "count", "value_samples")
            .collect()
        )

    before = snap()
    state_dir = Path(out) / "agg_state"
    first_part = sorted(state_dir.glob("_batch_id=*"))[0]
    backup = tmp_path / "replayed_partition"
    shutil.copytree(first_part, backup)

    wm = compact_state(spark, str(out))
    assert wm >= 0
    assert snap() == before  # compaction is invisible to readers

    # compacting again with no new batches is a no-op
    assert compact_state(spark, str(out)) == wm

    # simulate a replay: the folded batch partition reappears
    shutil.rmtree(first_part, ignore_errors=True)
    shutil.copytree(backup, first_part)
    assert snap() == before  # watermark excludes it: no double count
