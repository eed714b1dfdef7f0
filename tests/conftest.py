from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from otlp_cardinality_checker_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_frames():
    """FIXTURES.md tiny scale: 20 conv x 10 turns = 200 rows (plus truth)."""
    from otlp_cardinality_checker_spark.datagen import generate_transcripts

    return generate_transcripts(200)


@pytest.fixture(scope="session")
def tiny_routed(spark, tiny_frames):
    from otlp_cardinality_checker_spark.datagen import role_dim, tool_dim
    from otlp_cardinality_checker_spark.operators.enrich import enrich_turns
    from otlp_cardinality_checker_spark.operators.parse import parse_turns
    from otlp_cardinality_checker_spark.operators.route import route_turns

    transcripts, _, _ = tiny_frames
    df = spark.createDataFrame(transcripts)
    # tiny scale: role_dim deliberately missing `system` (FIXTURES.md §2)
    rd = spark.createDataFrame(role_dim(include_system=False))
    td = spark.createDataFrame(tool_dim())
    return route_turns(enrich_turns(parse_turns(df), rd, td)).cache()
