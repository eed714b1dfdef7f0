"""Sequence packing: concat-and-chunk documents into fixed token-budget
training sequences (the GPT-pretraining data layout).

Documents are concatenated in a deterministic order and cut into
``budget``-token chunks; a document that straddles a cut contributes its
tail to the next chunk (n_carryover tracks that). The operator reports the
per-chunk packing accounting — docs per chunk, token fill, carryover — the
numbers a training-data pipeline checks before writing packed shards
(fill factor, boundary waste, pathological short-doc chunks).

Packing is *embarrassingly shardable*: the concat order only needs to be
deterministic, not global, so docs are sharded first and each shard packs
independently. Chunk arithmetic is pure integers — cumulative token spans
``[cum_before, cum_end)`` against chunk boundaries — so the result is
bit-identical on any engine (the DuckDB oracle reproduces every row).

Scale shape: ONE scan computes token counts; the only shuffle is the
cumulative-sum window PARTITIONED BY shard (each partition holds
corpus/n_shards rows — raise ``n_shards`` with corpus size to bound the
per-partition sort; the default id-mod shard is uniform for dense ids, swap
in ``pmod(xxhash64(id), n)`` for adversarial id spaces — same algebra, not
DuckDB-reproducible). The chunk-span explode emits n/budget rows per doc
(bounded by document length), and the final per-(shard, chunk) hash-agg is
map-side combinable. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(shard, chunk) packing accounting.

    Returns (shard, chunk, n_docs, n_carryover, n_tokens, full) where
    ``chunk`` is the 0-based sequence index within the shard, ``n_docs``
    counts documents contributing >=1 token to the chunk, ``n_carryover``
    counts those that started in an earlier chunk (split docs), and
    ``full`` marks exactly-``budget``-token chunks (every chunk except a
    shard's last, by construction).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = F.lit(budget)
    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"),
            lambda t: F.length(t) >= 1,
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        docs.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
            n_tok.cast("long").alias("n"),
        )
        .where(F.col("n") > 0)  # empty docs occupy no tokens
        .withColumn("cum_end", F.sum("n").over(w))
        .withColumn("cum_before", F.col("cum_end") - F.col("n"))
    )
    # a doc spans chunks floor(cum_before/B) .. floor((cum_end-1)/B);
    # all-nonnegative longs, so `div` IS floor division on both engines
    exploded = spans.select(
        "shard",
        "cum_before",
        "cum_end",
        F.explode(
            F.sequence(
                F.expr(f"cum_before div {budget}"),
                F.expr(f"(cum_end - 1) div {budget}"),
            )
        ).alias("chunk"),
    )
    overlap = F.least(
        (F.col("chunk") + 1) * b, F.col("cum_end")
    ) - F.greatest(F.col("chunk") * b, F.col("cum_before"))
    carry = (F.col("cum_before") < F.col("chunk") * b).cast("long")
    return (
        exploded.groupBy("shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(carry).alias("n_carryover"),
            F.sum(overlap).alias("n_tokens"),
        )
        .withColumn("full", F.col("n_tokens") == b)
    )


def packing_summary(packed: DataFrame, budget: int = 256) -> DataFrame:
    """One-row fill-factor rollup of :func:`pack_sequences` output."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.col("full").cast("long")).alias("n_full"),
        F.round(
            F.sum("n_tokens") / (F.count(F.lit(1)) * F.lit(budget)), 4
        ).alias("fill_factor"),
        # boundary crossings, not distinct docs: a doc spanning k chunks
        # contributes k-1 carryovers
        F.sum("n_carryover").alias("n_carryovers"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """RAG-style per-document chunking: overlapping fixed-size token
    windows (stride = chunk_tokens - overlap), the layout an embedding /
    retrieval pipeline writes before vectorizing.  Complements
    ``pack_sequences`` (which concatenates ACROSS documents for training)
    with the within-document split used for indexing.

    Chunk count for a doc of n tokens: 1 if n <= chunk_tokens, else
    1 + ceil((n - chunk_tokens) / stride) — every token is covered, the
    last chunk may be short, and consecutive chunks share ``overlap``
    tokens.  Output: doc_id, chunk_idx, start_tok, n_chunk_tokens,
    chunk_digest (md5 of the space-joined window — the identity an
    index-build can verify against without re-reading the corpus).

    Scale shape: ZERO exchanges — one narrow projection per doc plus an
    explode bounded by n/stride rows per document; all arithmetic is
    integer (bit-identical across engines) and the digest is md5 for
    oracle parity.  The token split is materialized once (HOF rule);
    ``slice`` here is once per CHUNK row, not per element inside a
    lambda, so the word_shingles element_at discipline does not apply.
    """
    if chunk_tokens <= 0 or overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}, "
            f"{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_tok = F.size("_toks")
    # integer ceil-div via DIV (never `/`, which is float in Spark SQL)
    n_chunks = (
        F.when(n_tok <= chunk_tokens, F.lit(1))
        .otherwise(
            1
            + F.expr(
                f"(size(_toks) - {chunk_tokens} + {stride - 1}) "
                f"DIV {stride}"
            )
        )
        .cast("long")
    )
    d = docs.select(
        "doc_id",
        toks.alias("_toks"),
    ).select(
        "doc_id",
        "_toks",
        n_tok.cast("long").alias("n_tok"),
        F.explode_outer(
            F.sequence(F.lit(0).cast("long"), n_chunks - 1)
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    ntoks = F.least(F.lit(chunk_tokens).cast("long"), F.col("n_tok") - start)
    return d.select(
        "doc_id",
        "chunk_idx",
        start.alias("start_tok"),
        ntoks.alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    "_toks", (start + 1).cast("int"), ntoks.cast("int")
                ),
            )
        ).alias("chunk_digest"),
    )


def shard_plan(
    docs: DataFrame,
    budget: int = 1000,
    block_size: int = 64,
) -> DataFrame:
    """Export-shard planning over a GLOBAL document order: assign every
    document to the shard that contains its first token under a
    ``budget``-tokens-per-shard layout, then report the per-shard balance
    accounting (docs, tokens, sources, token span) a pipeline inspects
    before a 100-TB export — shard skew here becomes reader skew in every
    downstream training job.

    Unlike `pack_sequences` (which deliberately shards FIRST and packs
    independently), the export plan needs ONE corpus-wide token cumsum in
    ``(source, doc_id)`` order. A single global window is the textbook
    scale-killer (one partition sorts the corpus), so the cumsum is
    computed hierarchically in three bounded levels:

    1. doc grain: running sum WITHIN ``(source, block)`` where
       ``block = doc_id // block_size`` — every window partition holds at
       most ``block_size`` rows;
    2. block grain: running sum of block totals WITHIN source — one row
       per block, corpus/block_size rows total;
    3. source grain: preceding-source offsets via a broadcast self-join
       on the tiny per-source totals frame (O(S^2) pairs, S = #sources).

    ``doc_start = source_offset + (block_cum - block_total) +
    (intra_cum - ntok)`` equals the flat cumsum exactly — all integers,
    so the DuckDB oracle (a plain global window cumsum) must match
    bit-for-bit; the hierarchical==flat equivalence IS the correctness
    claim.

    Output grain: one row per shard — ``(shard_id, n_docs, shard_tokens,
    n_sources, start_token, end_token)``. Every shard except possibly the
    last spans ``budget`` start-token positions; ``shard_tokens`` can
    exceed ``budget`` by at most one document's tail (start-token
    assignment never splits a document).

    Scale shape: one scan for token counts; window partitions bounded by
    ``block_size`` (level 1) and blocks-per-source (level 2 — raise
    ``block_size`` with corpus size so both stay executor-sized); the
    level-3 join is broadcast; the final per-shard agg is map-side
    combinable. No global sort, no driver loop.
    """
    ntok = F.when(
        F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) == 0,
        F.lit(0),
    ).otherwise(
        F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
    )
    base = docs.select(
        "source",
        "doc_id",
        F.floor(F.col("doc_id") / F.lit(block_size)).alias("blk"),
        ntok.cast("long").alias("ntok"),
    )
    w_doc = (
        Window.partitionBy("source", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lvl1 = base.withColumn("intra_cum", F.sum("ntok").over(w_doc))

    btot = base.groupBy("source", "blk").agg(F.sum("ntok").alias("bt"))
    w_blk = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lvl2 = btot.withColumn("blk_cum", F.sum("bt").over(w_blk))

    stot = btot.groupBy("source").agg(F.sum("bt").alias("st"))
    off = (
        stot.alias("a")
        .join(
            F.broadcast(stot.alias("b")),
            F.col("b.source") < F.col("a.source"),
            "left",
        )
        .groupBy(F.col("a.source").alias("source"))
        .agg(F.coalesce(F.sum("b.st"), F.lit(0)).alias("src_off"))
    )

    placed = (
        lvl1.join(lvl2.select("source", "blk", "bt", "blk_cum"), ["source", "blk"])
        .join(F.broadcast(off), "source")
        .select(
            "source",
            "ntok",
            (
                F.col("src_off")
                + (F.col("blk_cum") - F.col("bt"))
                + (F.col("intra_cum") - F.col("ntok"))
            ).alias("doc_start"),
        )
    )
    return (
        placed.groupBy(
            F.floor(F.col("doc_start") / F.lit(budget)).alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("shard_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_start").alias("start_token"),
            F.max(F.col("doc_start") + F.col("ntok")).alias("end_token"),
        )
    )
