"""Report sink tests (reference report_test.go / generator_test.go shapes)."""

from __future__ import annotations


def test_report_thresholds_and_exit_code(spark):
    from otlp_cardinality_checker_spark.report import generate_report

    rows = [
        ("chat", "low", 100, 5),
        ("chat", "warny", 5000, 1500),
        ("chat", "crit", 50000, 20000),
    ]
    df = spark.createDataFrame(
        rows, "sink string, key string, count long, est_cardinality long"
    )
    rep = generate_report(df)
    levels = {e["key"]: e["level"] for e in rep.entries}
    assert levels == {"low": "ok", "warny": "warning", "crit": "critical"}
    assert rep.n_warning == 1 and rep.n_critical == 1
    assert rep.exit_code == 1
    assert "CARDINALITY REPORT" in rep.to_text()
    assert '"exit_code": 1' in rep.to_json()

    rep_ok = generate_report(df, warn=10**6, critical=10**7)
    assert rep_ok.exit_code == 0


def test_report_ordering_and_limit(spark):
    from otlp_cardinality_checker_spark.report import generate_report

    rows = [("chat", f"k{i}", 10, i * 100) for i in range(20)]
    df = spark.createDataFrame(
        rows, "sink string, key string, count long, est_cardinality long"
    )
    rep = generate_report(df, limit=5)
    cards = [e["est_cardinality"] for e in rep.entries]
    assert cards == sorted(cards, reverse=True)
    assert len(rep.entries) == 5
