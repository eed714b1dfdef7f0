"""BPE tokenizer: independent-implementation parity + invariants.

bpe_train is an iterative argmax — no cross-engine SQL oracle can exist,
so (like Drain in tests/test_drain_oracle.py) correctness is pinned by a
SECOND implementation written here from scratch with a different
structure (regex substitution over space-joined symbol strings, full
recount each round) and compared for exact merge-table equality.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def _reference_bpe(word_counts: dict[str, int],
                   n_merges: int) -> list[tuple[str, str]]:
    """Independent BPE trainer: symbols kept as space-joined strings,
    merges applied by regex, pair counts recomputed from scratch each
    round (no shared code or data layout with operators/bpe.py)."""
    vocab = {
        " ".join(list(w) + ["</w>"]): c for w, c in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for spaced, c in vocab.items():
            syms = spaced.split(" ")
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        vocab = {
            pat.sub(best[0] + best[1], spaced): c
            for spaced, c in vocab.items()
        }
    return merges


def test_train_matches_independent_implementation(spark):
    from otlp_cardinality_checker_spark.operators.bpe import (
        bpe_train,
        word_histogram,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist = word_histogram(docs)
    counts = {r["word"]: r["cnt"] for r in hist.collect()}
    assert bpe_train(hist, 60) == _reference_bpe(counts, 60)


def test_train_matches_on_synthetic_tiebreak_corpus(spark):
    """Hand corpus engineered so early rounds have count ties — the
    lexicographic tie-break must agree between the implementations."""
    from otlp_cardinality_checker_spark.operators.bpe import bpe_train

    words = [("abab", 3), ("baba", 3), ("aabb", 3), ("zz", 9)]
    hist = spark.createDataFrame(words, "word string, cnt long")
    counts = dict(words)
    assert bpe_train(hist, 12) == _reference_bpe(counts, 12)


def test_encode_roundtrip_and_monotonicity(spark):
    from otlp_cardinality_checker_spark.operators.bpe import (
        bpe_train,
        encode_word,
        word_histogram,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist = word_histogram(docs)
    merges = bpe_train(hist, 50)
    ranks = {p: i for i, p in enumerate(merges)}
    words = [r["word"] for r in hist.limit(200).collect()]
    for w in words:
        toks = encode_word(w, ranks)
        # lossless: concatenated tokens reproduce the word + end marker
        assert "".join(toks) == w + "</w>"
    # more merges can only shorten (or keep) every encoding
    half = {p: i for i, p in enumerate(merges[:25])}
    for w in words:
        assert len(encode_word(w, ranks)) <= len(encode_word(w, half))


def test_token_stats_consistency(spark):
    """Distributed encode agrees with driver-side encode_word, and zero
    merges degenerate to chars + end markers."""
    from otlp_cardinality_checker_spark.operators.bpe import (
        bpe_token_stats,
        bpe_train,
        encode_word,
        word_histogram,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    merges = bpe_train(word_histogram(docs), 30)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_stats(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        ws = [w for w in r["text"].strip().split(" ") if w]
        exp = sum(len(encode_word(w, ranks)) for w in ws)
        assert got[r["doc_id"]] == (len(ws), exp)
    zero = bpe_token_stats(docs, []).agg(
        F.sum("n_tokens").alias("t")
    ).collect()[0]["t"]
    chars = docs.select(
        F.sum(
            F.length(F.regexp_replace(F.trim("text"), " ", ""))
        ).alias("c"),
        F.sum(F.size(F.split(F.trim("text"), " "))).alias("w"),
    ).collect()[0]
    assert zero == chars["c"] + chars["w"]


def test_train_matches_on_random_corpora(spark):
    """Randomized parity sweep: seeded corpora with heavy repetition and
    self-overlapping runs (the incremental trainer's hard cases — pairs
    occurring many times inside one word, counts vanishing mid-round)."""
    import random

    from otlp_cardinality_checker_spark.operators.bpe import bpe_train

    for seed in range(5):
        rnd = random.Random(seed)
        alpha = "abc"
        words = {}
        for _ in range(40):
            w = "".join(
                rnd.choice(alpha) * rnd.randint(1, 4)
                for _ in range(rnd.randint(1, 5))
            )
            words[w] = words.get(w, 0) + rnd.randint(1, 9)
        hist = spark.createDataFrame(
            list(words.items()), "word string, cnt long"
        )
        assert bpe_train(hist, 40) == _reference_bpe(words, 40), seed


def test_max_vocab_truncates_by_documented_order(spark):
    """max_vocab keeps exactly the top-cap words by (cnt desc, word desc)
    — training on the capped histogram equals the independent trainer on
    that explicit truncation, and a cap >= dict size is a no-op.  Seeded
    duplicate counts put ties ON the cap boundary."""
    import random

    from otlp_cardinality_checker_spark.operators.bpe import bpe_train

    for seed in range(3):
        rnd = random.Random(100 + seed)
        words = {
            "".join(rnd.choice("abcd") for _ in range(rnd.randint(2, 6))):
            rnd.randint(1, 4)  # tiny count range -> ties at every rank
            for _ in range(60)
        }
        hist = spark.createDataFrame(
            list(words.items()), "word string, cnt long"
        )
        for cap in (7, 20, len(words), len(words) + 50):
            kept = dict(
                sorted(
                    words.items(),
                    key=lambda kv: (kv[1], kv[0]),
                    reverse=True,
                )[:cap]
            )
            got = bpe_train(hist, 30, max_vocab=cap)
            assert got == _reference_bpe(kept, 30), (seed, cap)
        assert bpe_train(hist, 30, max_vocab=10**6) == _reference_bpe(
            words, 30
        )


def test_tokenizer_fertility_closed_form(spark):
    """With an empty merge table every word encodes to its characters,
    so fertility == chars-per-word exactly; with merges fully covering a
    word, that word costs 1 token — both closed forms checked."""
    from otlp_cardinality_checker_spark.operators.bpe import (
        tokenizer_fertility,
    )

    rows = [(0, "s", "ab ab"), (1, "s", "abc")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    no_merges = tokenizer_fertility(docs, [], by="source").collect()[0]
    # every word encodes to chars + the </w> marker: (2+1)*2 + (3+1) = 10
    assert no_merges["n_words"] == 3 and no_merges["n_tokens"] == 10
    assert no_merges["fertility"] == round(10 / 3, 6)
    # n_chars counts raw text incl. the space: 5 + 3 = 8
    assert no_merges["chars_per_token"] == round(8 / 10, 6)

    from otlp_cardinality_checker_spark.operators.bpe import (
        END,
        encode_word,
    )

    merges = [("a", "b"), ("ab", END), ("ab", "c"), ("abc", END)]
    assert len(encode_word("ab", {p: i for i, p in enumerate(merges)})) == 1
    merged = tokenizer_fertility(docs, merges, by="source").collect()[0]
    # each word fully merges into ONE token
    assert merged["n_tokens"] == 3 and merged["fertility"] == 1.0
