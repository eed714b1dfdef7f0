"""BM25 retrieval tests: hand-computed scores on a crafted corpus plus
structural invariants on the fixture documents table."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_bm25_hand_computed(spark):
    """3-doc corpus, one query — scores checked against a by-hand Okapi
    BM25 computation (k1=1.2, b=0.75, Lucene idf)."""
    from otlp_cardinality_checker_spark.operators.search import bm25_topk

    rows = [
        (1, "cat dog cat"),          # dl=3, tf(cat)=2, tf(dog)=1
        (2, "cat bird bird bird"),   # dl=4, tf(cat)=1
        (3, "fish fish"),            # dl=2, no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in bm25_topk(docs, queries=[(7, "cat dog")], k=10).collect()
    }
    assert set(got) == {1, 2}  # doc 3 shares no term

    n, avgdl, k1, b = 3, 3.0, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def tfnorm(tf, dl):
        return tf / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = round(idf(2) * tfnorm(2, 3) + idf(1) * tfnorm(1, 3), 4)
    exp2 = round(idf(2) * tfnorm(1, 4), 4)
    assert got[1]["score"] == exp1
    assert got[2]["score"] == exp2
    assert got[1]["n_terms_matched"] == 2
    assert got[2]["n_terms_matched"] == 1
    assert got[1]["rank"] == 1 and got[2]["rank"] == 2


def test_bm25_fixture_invariants(spark):
    """Default queries over the fixture corpus: rank contiguity per query,
    score monotone non-increasing, matched-term bound."""
    from otlp_cardinality_checker_spark.operators.search import (
        DEFAULT_QUERIES,
        bm25_topk,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pdf = bm25_topk(docs, k=5).toPandas()
    assert set(pdf["query_id"]) == {q for q, _ in DEFAULT_QUERIES}
    for _, grp in pdf.groupby("query_id"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 0).all()
        assert (g["n_terms_matched"] <= 3).all()
        assert (g["score"] > 0).all()


def test_bm25_index_parquet_roundtrip(spark, tmp_path):
    """build_bm25_index persisted to parquet and re-read must give
    bm25_query results identical to the one-shot bm25_topk."""
    from otlp_cardinality_checker_spark.operators.search import (
        DEFAULT_QUERIES,
        bm25_query,
        bm25_topk,
        build_bm25_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx_path = str(tmp_path / "bm25_index")
    build_bm25_index(docs).write.parquet(idx_path)
    via_index = bm25_query(
        spark.read.parquet(idx_path), DEFAULT_QUERIES, k=5
    )
    one_shot = bm25_topk(docs, k=5)
    a = sorted(map(tuple, via_index.collect()))
    b = sorted(map(tuple, one_shot.collect()))
    assert a == b and len(a) > 0


def test_embedding_health_degenerate_flags(spark):
    """Zero vectors and NaN components are flagged; norms match the
    closed form at 6 dp; dim is per-row exact."""
    import math

    from otlp_cardinality_checker_spark.operators.similarity import (
        embedding_health,
    )

    rows = [
        (0, [3.0, 4.0]),                  # norm 5
        (1, [0.0, 0.0]),                  # zero
        (2, [1.0, float("nan")]),         # NaN
        (3, [1.0, 2.0, 2.0]),             # dim 3, norm 3
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in embedding_health(vecs).collect()}
    assert got[0]["l2_norm"] == 5.0 and not got[0]["is_zero"]
    assert got[1]["is_zero"] and not got[1]["has_nan"]
    assert got[2]["has_nan"] and math.isnan(got[2]["l2_norm"])
    assert got[3]["dim"] == 3 and got[3]["l2_norm"] == 3.0


def test_embedding_quantization_numpy_twin(spark):
    """int8 symmetric quantization audit must match a numpy
    implementation of the same formula, including a zero vector (exact
    reconstruction) and a clamp-exercising outlier component."""
    import numpy as np

    from otlp_cardinality_checker_spark.operators.similarity import (
        embedding_quantization,
    )

    vecs = [
        (0, 0, [0.5, -0.25, 0.125, 0.0]),
        (1, 0, [1.0, 0.001, -0.002, 0.003]),
        (2, 1, [0.0, 0.0, 0.0, 0.0]),        # zero vector
        (3, 1, [0.1, 0.2, -0.3, 0.4]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, label int, embedding array<float>"
    )
    got = {r["label"]: r for r in embedding_quantization(df).collect()}

    def audit(rows):
        sp = np_ = 0.0
        scales = []
        for _, _, v in rows:
            v = np.array(v, dtype=np.float32).astype(np.float64)
            m = np.abs(v).max()
            s = m / 127.0
            scales.append(s)
            sp += float((v * v).sum())
            if m == 0:
                continue
            q = np.clip(np.round(v / s), -127, 127)
            np_ += float(((v - s * q) ** 2).sum())
        return scales, sp, np_

    for lbl in (0, 1):
        rows = [r for r in vecs if r[1] == lbl]
        scales, sp, np_ = audit(rows)
        g = got[lbl]
        assert g["n_vecs"] == len(rows)
        assert abs(g["avg_scale"] - round(sum(scales) / len(scales), 8)) <= 1e-8
        assert abs(g["signal_power"] - round(sp, 6)) <= 1e-6
        assert abs(g["noise_power"] - round(np_, 6)) <= 1e-6
        if np_ > 0:
            import math
            assert abs(g["snr_db"] - round(10 * math.log10(sp / np_), 4)) <= 1e-3

    # zero vector contributed nothing to label-1 noise beyond vec 3
    assert got[1]["noise_power"] >= 0.0


def test_class_separability_orders_separated_above_mixed(spark):
    """Two tight, distant clusters give a large Fisher ratio; two
    interleaved clusters give ~0 — numpy twin checks the numbers."""
    import numpy as np

    from otlp_cardinality_checker_spark.operators.similarity import (
        class_separability,
    )

    rows = []
    vid = 0
    # labels 0/1: tight clusters far apart on dim 0
    for lbl, center in ((0, -10.0), (1, 10.0)):
        for i in range(8):
            rows.append((vid, lbl, [center + 0.1 * (i % 3), 0.0, 1.0]))
            vid += 1
    # label 2: sits on top of label 0 (inseparable pair (0, 2))
    for i in range(8):
        rows.append((vid, 2, [-10.0 + 0.1 * (i % 3), 0.0, 1.0]))
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {(r["label_a"], r["label_b"]): r
           for r in class_separability(df).collect()}

    def twin(va, vb):
        # the column is array<float>: route the twin through float32 so
        # both sides quantize identically before the float64 math
        va = np.array(va, dtype=np.float32).astype(np.float64)
        vb = np.array(vb, dtype=np.float32).astype(np.float64)
        ca, cb = va.mean(0), vb.mean(0)
        cd2 = float(((ca - cb) ** 2).sum())
        sa = float((((va - ca) ** 2).sum(1)).mean())
        sb = float((((vb - cb) ** 2).sum(1)).mean())
        return np.sqrt(cd2), cd2 / (sa + sb)

    by_label = {}
    for _, lbl, v in rows:
        by_label.setdefault(lbl, []).append(v)
    for (a, b), r in got.items():
        dist, fisher = twin(by_label[a], by_label[b])
        assert abs(r["centroid_dist"] - round(dist, 6)) <= 1e-4
        assert abs(r["fisher_ratio"] - fisher) <= 1e-5 * max(fisher, 1.0)
    assert got[(0, 1)]["fisher_ratio"] > 1000 * got[(0, 2)]["fisher_ratio"]
