"""BM25 full-text retrieval over the documents corpus.

The training-data counterpart of the reference's attribute/pattern lookup
endpoints (server.go's search-ish GETs): given a small set of keyword
queries, return the top-k documents per query ranked by Okapi BM25 — the
operator a curation pipeline uses for targeted corpus audits ("show me the
documents about X") and for retrieval-based decontamination (find the
training docs that match an eval question before it leaks).

Scoring (Lucene/Robertson variant, always-positive idf):

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t, d) = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d)  = sum over distinct query terms t present in d

Scale shape (the part that matters at 100 TB):

* the corpus is tokenized and exploded ONCE; the exploded frame feeds two
  aggregations — per-document length (dl) and matched postings — via a
  localCheckpoint so neither consumer re-runs the split (same idiom as
  unigram_cross_entropy).
* the query-term dimension is tiny by construction (a handful of keyword
  queries) and is BROADCAST; postings are semi-joined down to query terms
  BEFORE the tf aggregation, so the per-(doc, term) hash agg runs over
  matching postings only, never the full vocabulary.
* df(t) is computed from the matched postings (distinct docs per query
  term) — vocabulary-of-the-query-sized, not corpus-vocabulary-sized.
* N and avgdl are one-row scalars, crossJoin(broadcast(...)) per
  CLAUDE.md's no-empty-Window rule.
* final top-k per query: scores are rounded to 4 places BEFORE ranking
  (cross-engine tie stability) and ranked by a window PARTITIONED BY
  query_id over the candidate set (docs sharing >=1 query term) — bounded
  by posting-list size, and at web scale the hot-term fan-out is the same
  stop-gram problem dedup already solves; reuse a df cap upstream if a
  query term is a stopword.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic audit queries over the corpus vocabulary. Literal and
# versioned on purpose: the driver oracle mirrors them as a VALUES clause.
DEFAULT_QUERIES: list[tuple[int, str]] = [
    (1, "hash join merge"),
    (2, "fast scan filter"),
    (3, "stream window agg"),
    (4, "customer query table"),
]

K1 = 1.2
B = 0.75


def _tokens(text_col, min_len: int = 2, token_pattern: str = "[^a-z]+"):
    return F.filter(
        F.split(F.lower(text_col), token_pattern),
        lambda t: F.length(t) >= min_len,
    )


def build_bm25_index(
    docs: DataFrame,
    min_len: int = 2,
    token_pattern: str = "[^a-z]+",
) -> DataFrame:
    """The persistable BM25 inverted index: one (doc_id, term, c) row per
    posting. Index ONCE, query many times — write with
    ``.write.partitionBy().parquet(path)`` (or bucketBy on `term` in a
    real metastore so query-term probes prune to matching buckets) and
    feed the re-read frame to :func:`bm25_query`. dl / N / avgdl are all
    derived from this frame, so the index is the ONLY state.

    The (doc, term) grain is vocab-per-doc-sized — far smaller than the
    raw token stream — and the groupBy is map-side combinable."""
    return (
        docs.select(
            "doc_id",
            F.explode_outer(
                _tokens(F.col("text"), min_len, token_pattern)
            ).alias("term"),
        )
        .where(F.col("term").isNotNull())  # see dedup._capped_inverted_index
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bm25_query(
    doc_terms: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = K1,
    b: float = B,
    min_len: int = 2,
    token_pattern: str = "[^a-z]+",
) -> DataFrame:
    """Top-k BM25 over a prebuilt :func:`build_bm25_index` frame.

    Returns (query_id, doc_id, n_terms_matched, score, rank) with rank
    1..k per query, ties broken by doc_id ascending on the 4-dp-rounded
    score."""
    spark = doc_terms.sparkSession
    qterms = (
        spark.createDataFrame(queries, "query_id int, qtext string")
        .select(
            "query_id",
            F.explode(
                _tokens(F.col("qtext"), min_len, token_pattern)
            ).alias("term"),
        )
        .distinct()
    )
    dl = doc_terms.groupBy("doc_id").agg(F.sum("c").alias("dl"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # postings restricted to query terms (broadcast semi-join over the
    # already-aggregated counts — the join never sees non-matching terms)
    tf = doc_terms.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).select("doc_id", "term", F.col("c").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfnorm = F.col("tf") / (
        F.col("tf")
        + F.lit(k1)
        * (1.0 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum(idf * tfnorm), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "n_terms_matched", "score", "rank"
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    k: int = 5,
    k1: float = K1,
    b: float = B,
    min_len: int = 2,
    token_pattern: str = "[^a-z]+",
) -> DataFrame:
    """One-shot convenience: :func:`build_bm25_index` +
    :func:`bm25_query` with the index materialized once in-session
    (localCheckpoint bridges the dl and postings branches; persist the
    index to parquet via build_bm25_index for the query-many shape).

    ``token_pattern`` is the split regex — the default is the package's
    letters-only tokenizer (what the DuckDB oracle mirrors); pass
    "[^a-z0-9]+" for alphanumeric corpora (identifiers, SKU-like
    tokens), as the 500k-doc soak does.
    """
    qs = queries if queries is not None else DEFAULT_QUERIES
    doc_terms = build_bm25_index(
        docs, min_len=min_len, token_pattern=token_pattern
    ).localCheckpoint(eager=True)
    return bm25_query(
        doc_terms,
        qs,
        k=k,
        k1=k1,
        b=b,
        min_len=min_len,
        token_pattern=token_pattern,
    )
