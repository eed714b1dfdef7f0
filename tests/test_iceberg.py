"""Iceberg runtime-path integration tests — skip-gated on the runtime jar.

The north rule names Iceberg tables and MERGE-INTO-style resumable state
explicitly; this container has no network and no Iceberg runtime jar, so
these tests SKIP here. They are the executable contract for the gated
branches: on any machine with `iceberg-spark-runtime` on the classpath
(e.g. `spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-
4.0_2.13:<ver>` plus a `local`-type hadoop catalog), `pytest
tests/test_iceberg.py` must pass as written — exercising exactly the code
paths that fall back to parquet emulation in-container:

* `route.write_sinks` Iceberg branch: bucket(conv_id) partition transform,
  catalog-qualified identifiers returned, append vs createOrReplace mode.
* MERGE INTO for streaming aggregate state: the idempotent-upsert
  semantics `streaming.stream.compact_state` emulates with the versioned
  snapshot pointer.
"""

from __future__ import annotations

import pytest


def _iceberg_ready(spark) -> bool:
    from otlp_cardinality_checker_spark.sources.transcripts import (
        _iceberg_available,
    )

    if not _iceberg_available(spark):
        return False
    # a class on the classpath is not enough: a catalog must be configured
    return bool(spark.conf.get("spark.sql.catalog.local", None))


@pytest.fixture()
def iceberg_spark(spark):
    if not _iceberg_ready(spark):
        pytest.skip(
            "Iceberg runtime jar / catalog not available in this container"
        )
    return spark


def test_write_sinks_iceberg_identifiers_and_modes(iceberg_spark, tiny_routed, tmp_path):
    """Iceberg mode must return CATALOG identifiers (not filesystem paths),
    honor append mode, and bucket by conv_id."""
    from otlp_cardinality_checker_spark.operators.route import write_sinks

    locations = write_sinks(
        tiny_routed,
        str(tmp_path),
        n_buckets=4,
        table_format="iceberg",
        iceberg_namespace="local.sinks_test",
    )
    assert set(locations) == {"chat", "error", "tool_call"}
    for name, ident in locations.items():
        assert ident == f"local.sinks_test.sink_{name}"
        assert iceberg_spark.table(ident).count() >= 0

    n_before = iceberg_spark.table(locations["chat"]).count()
    write_sinks(
        tiny_routed,
        str(tmp_path),
        n_buckets=4,
        mode="append",
        table_format="iceberg",
        iceberg_namespace="local.sinks_test",
    )
    assert iceberg_spark.table(locations["chat"]).count() == 2 * n_before

    # overwrite (default) resets
    write_sinks(
        tiny_routed,
        str(tmp_path),
        n_buckets=4,
        table_format="iceberg",
        iceberg_namespace="local.sinks_test",
    )
    assert iceberg_spark.table(locations["chat"]).count() == n_before


def test_merge_into_state_idempotent(iceberg_spark, tiny_routed):
    """MERGE INTO keyed on (sink, key) is the Iceberg-native form of the
    per-batch state upsert: replaying the same batch must not change the
    table (the parquet emulation proves this via the batch-id watermark;
    Iceberg proves it via the MERGE condition)."""
    from otlp_cardinality_checker_spark.operators.sessions import (
        snapshot_key_stats,
    )

    snap = snapshot_key_stats(tiny_routed).select("sink", "key", "count")
    snap.createOrReplaceTempView("batch_state")
    iceberg_spark.sql("DROP TABLE IF EXISTS local.state_test.key_counts")
    iceberg_spark.sql("CREATE NAMESPACE IF NOT EXISTS local.state_test")
    iceberg_spark.sql(
        "CREATE TABLE local.state_test.key_counts "
        "(sink STRING, key STRING, count BIGINT, last_batch INT) USING iceberg"
    )
    merge = """
        MERGE INTO local.state_test.key_counts t
        USING (SELECT *, 0 AS batch_id FROM batch_state) s
        ON t.sink = s.sink AND t.key = s.key
        WHEN MATCHED AND s.batch_id > t.last_batch THEN
          UPDATE SET count = t.count + s.count, last_batch = s.batch_id
        WHEN NOT MATCHED THEN
          INSERT (sink, key, count, last_batch)
          VALUES (s.sink, s.key, s.count, s.batch_id)
    """
    iceberg_spark.sql(merge)
    first = sorted(
        tuple(r)
        for r in iceberg_spark.table("local.state_test.key_counts").collect()
    )
    iceberg_spark.sql(merge)  # replay of the SAME batch: no-op by guard
    second = sorted(
        tuple(r)
        for r in iceberg_spark.table("local.state_test.key_counts").collect()
    )
    assert first == second
