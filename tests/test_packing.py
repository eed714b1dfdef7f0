"""Sequence-packing tests: hand-computed chunk layout, token conservation,
and the every-chunk-full-except-shard-last invariant."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_pack_hand_computed_single_shard(spark):
    """One shard, budget 5: doc token spans laid out by hand.

    docs (doc_id, tokens): (0, 3) (8, 4) (16, 7) -> concat length 14
    chunks: [0,5) [5,10) [10,14)
      doc 0 spans [0,3)   -> chunk 0
      doc 8 spans [3,7)   -> chunks 0,1 (split)
      doc 16 spans [7,14) -> chunks 1,2 (split)
    """
    from otlp_cardinality_checker_spark.operators.packing import (
        pack_sequences,
        packing_summary,
    )

    rows = [
        (0, "a b c"),
        (8, "d e f g"),
        (16, "h i j k l m n"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["shard"], r["chunk"]): r
        for r in pack_sequences(docs, budget=5, n_shards=8).collect()
    }
    assert set(got) == {(0, 0), (0, 1), (0, 2)}
    c0, c1, c2 = got[(0, 0)], got[(0, 1)], got[(0, 2)]
    assert (c0["n_docs"], c0["n_carryover"], c0["n_tokens"], c0["full"]) == (2, 0, 5, True)
    assert (c1["n_docs"], c1["n_carryover"], c1["n_tokens"], c1["full"]) == (2, 1, 5, True)
    assert (c2["n_docs"], c2["n_carryover"], c2["n_tokens"], c2["full"]) == (1, 1, 4, False)

    s = packing_summary(
        pack_sequences(docs, budget=5, n_shards=8), budget=5
    ).collect()[0]
    assert s["n_chunks"] == 3 and s["n_tokens"] == 14 and s["n_full"] == 2
    assert s["fill_factor"] == round(14 / 15, 4)


def test_pack_invariants_on_fixture(spark):
    """Token conservation and chunk-fill invariants on the fixture corpus."""
    import pyspark.sql.functions as F

    from otlp_cardinality_checker_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    budget, n_shards = 64, 4
    packed = pack_sequences(docs, budget=budget, n_shards=n_shards).cache()
    pdf = packed.toPandas()

    # token conservation: packed tokens == corpus token count
    n_corpus = docs.select(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"),
                    lambda t: F.length(t) >= 1,
                )
            )
        ).alias("n")
    ).collect()[0]["n"]
    assert int(pdf["n_tokens"].sum()) == n_corpus

    # every chunk holds <= budget tokens; within each shard every chunk
    # except the last is exactly full, and chunk ids are contiguous from 0
    assert (pdf["n_tokens"] <= budget).all()
    for _, g in pdf.groupby("shard"):
        g = g.sort_values("chunk")
        assert list(g["chunk"]) == list(range(len(g)))
        assert g["full"].iloc[:-1].all()
    # a chunk is full iff n_tokens == budget (column consistency)
    assert ((pdf["n_tokens"] == budget) == pdf["full"]).all()
    # carryover never exceeds 1 per chunk start and never counts chunk 0
    # of a shard whose first doc starts at offset 0
    assert (pdf["n_carryover"] <= 1).all()
    assert (pdf.loc[pdf["chunk"] == 0, "n_carryover"] == 0).all()
    packed.unpersist()


def test_chunk_documents_layout(spark):
    """Coverage, overlap, and short-doc semantics of the RAG chunker."""
    from otlp_cardinality_checker_spark.operators.packing import (
        chunk_documents,
    )

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 3 chunks (4,4,4)
        (2, " ".join(f"t{i}" for i in range(11))),  # 4 chunks (…, 2)
        (3, "a b c d"),                             # exactly one chunk
        (4, "a b"),                                 # short doc, one chunk
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
    assert [
        (r["start_tok"], r["n_chunk_tokens"]) for r in by_doc[1]
    ] == [(0, 4), (3, 4), (6, 4)]
    assert [
        (r["start_tok"], r["n_chunk_tokens"]) for r in by_doc[2]
    ] == [(0, 4), (3, 4), (6, 4), (9, 2)]
    assert [(r["start_tok"], r["n_chunk_tokens"]) for r in by_doc[3]] == [
        (0, 4)
    ]
    assert [(r["start_tok"], r["n_chunk_tokens"]) for r in by_doc[4]] == [
        (0, 2)
    ]
    # every token covered: last chunk ends at n_tok on each doc
    for doc_id, n in ((1, 10), (2, 11), (3, 4), (4, 2)):
        last = by_doc[doc_id][-1]
        assert last["start_tok"] + last["n_chunk_tokens"] == n
    # identical windows -> identical digests (doc 1 and 2 share prefix)
    assert by_doc[1][0]["chunk_digest"] == by_doc[2][0]["chunk_digest"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_shard_plan_equals_flat_python_cumsum(spark):
    """The three-level hierarchical cumsum must reproduce a flat Python
    cumsum over (source, doc_id) order exactly — multi-source, multi-block
    (block_size=4 forces level-2 work), empty and None texts included."""
    from otlp_cardinality_checker_spark.operators.packing import shard_plan

    rows = []
    for i in range(37):
        src = f"s{i % 3}"
        txt = None if i == 5 else ("" if i == 11 else "w " * ((i * 7) % 13 + 1))
        rows.append((i, src, txt))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def ntok(t):
        return 0 if not t or not t.strip() else len(t.split())

    flat = sorted(rows, key=lambda r: (r[1], r[0]))
    cum, starts = 0, {}
    for doc_id, src, txt in flat:
        starts[doc_id] = (src, cum, ntok(txt))
        cum += ntok(txt)

    budget = 10
    want = {}
    for doc_id, (src, st, n) in starts.items():
        sid = st // budget
        d = want.setdefault(sid, dict(n_docs=0, toks=0, srcs=set(),
                                      lo=None, hi=None))
        d["n_docs"] += 1
        d["toks"] += n
        d["srcs"].add(src)
        d["lo"] = st if d["lo"] is None else min(d["lo"], st)
        d["hi"] = st + n if d["hi"] is None else max(d["hi"], st + n)

    got = {r["shard_id"]: r for r in
           shard_plan(docs, budget=budget, block_size=4).collect()}
    assert set(got) == set(want)
    for sid, w in want.items():
        g = got[sid]
        assert g["n_docs"] == w["n_docs"]
        assert g["shard_tokens"] == w["toks"]
        assert g["n_sources"] == len(w["srcs"])
        assert g["start_token"] == w["lo"]
        assert g["end_token"] == w["hi"]


def test_shard_plan_conservation_and_contiguity(spark):
    """Token mass is conserved across shards and shard ids are the
    contiguous prefix 0..max (no start-token position is skipped when
    every shard's span is covered by documents)."""
    from otlp_cardinality_checker_spark.operators.packing import shard_plan

    docs = spark.createDataFrame(
        [(i, "s", "t " * 5) for i in range(40)],
        "doc_id long, source string, text string",
    )
    out = shard_plan(docs, budget=25, block_size=8).collect()
    ids = sorted(r["shard_id"] for r in out)
    assert ids == list(range(len(ids)))
    assert sum(r["shard_tokens"] for r in out) == 200
    # uniform 5-token docs, budget 25 -> every shard holds exactly 5 docs
    assert all(r["n_docs"] == 5 and r["shard_tokens"] == 25 for r in out)
