"""Text-analysis operator tests (documents table + crafted rows)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_language_id_markers(spark):
    from otlp_cardinality_checker_spark.operators.text_analysis import language_id

    rows = [
        (1, "xx", "the cat and the dog of the house went to the market"),
        (2, "xx", "der hund und die katze und nicht der vogel"),
        (3, "xx", "zzz qqq www"),
        (4, "xx", "le chat est sur les toits des maisons"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in language_id(docs).collect()}
    assert got[1]["lang_detected"] == "en"
    assert got[2]["lang_detected"] == "de"
    assert got[3]["lang_detected"] == "und"
    assert got[3]["marker_score"] == 0
    assert got[4]["lang_detected"] == "fr"


def test_quality_scores_ranges(spark):
    from otlp_cardinality_checker_spark.operators.text_analysis import quality_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = quality_scores(docs).toPandas()
    assert (got["n_tokens"] >= 1).all()
    for col in ("alpha_ratio", "digit_ratio", "punct_ratio"):
        assert got[col].between(0, 1).all()


def test_fingerprint_whitespace_canonicalization(spark):
    from otlp_cardinality_checker_spark.operators.text_analysis import fingerprints

    rows = [(1, "Hello   World"), (2, "hello world"), (3, "other text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
