"""Postings construction — the distributed analog of the reference's
``word_frequencies`` table (reference: app/db/models.py:94-110, populated by
app/repositories/document.py:148-173).

Shuffle budget of the whole build path:

  scan -> tokenize_counts_udf (narrow, Arrow)        : 0 shuffles
       -> explode map -> postings(doc_id, term, cnt) : 0 shuffles
       -> doc_stats (dl from map_values sum)         : 0 shuffles
  postings -> groupBy(term) df                       : 1 shuffle (partial agg
                                                       map-side, tiny rows)

Per-doc counting happens inside the tokenize kernel, so (doc_id, term) is
unique by construction and the reference's COUNT(DISTINCT document_id)
(app/repositories/document.py:206-226) degenerates to a plain count — no
distinct shuffle. High-DF term skew in the *count* aggregation is already
handled by Catalyst's partial+final hash agg (each map task emits one row
per term); explicit salting is only needed where a single term's payload is
large — the posting-list build — and lives in index/builder.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfidf_spark.functions.tokenize import tokenize_counts_udf


def with_term_counts(
    docs: DataFrame,
    text_col: str = "content",
    code_aware: bool = False,
) -> DataFrame:
    """Add ``term_counts map<term,int>`` and ``dl`` (doc length = Σ counts).

    ``dl`` is the reference's ``total_words``
    (app/repositories/document.py:159) and BM25's per-document length.
    Zero-token docs get dl=0 and an empty map; they emit no postings but
    still count toward N (reference counts all docs in scope,
    app/repositories/document.py:231-255).
    """
    out = docs.withColumn("term_counts", tokenize_counts_udf(code_aware)(F.col(text_col)))
    return out.withColumn(
        "dl",
        F.coalesce(
            F.aggregate(F.map_values("term_counts"), F.lit(0), lambda acc, x: acc + x),
            F.lit(0),
        ),
    )


def explode_postings(counted: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, term, cnt, dl)`` posting rows; (doc_id, term) unique."""
    return counted.select(
        F.col(id_col).alias("doc_id"),
        F.explode("term_counts").alias("term", "cnt"),
        F.col("dl"),
    )


def build_postings(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    code_aware: bool = False,
) -> DataFrame:
    """End-to-end: docs -> posting rows ``(doc_id, term, cnt, dl)``."""
    return explode_postings(with_term_counts(docs, text_col, code_aware), id_col)


def doc_stats(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    code_aware: bool = False,
) -> DataFrame:
    """Per-document stats ``(doc_id, dl, n_unique)`` — shuffle-free."""
    counted = with_term_counts(docs, text_col, code_aware)
    return counted.select(
        F.col(id_col).alias("doc_id"),
        F.col("dl"),
        F.size("term_counts").alias("n_unique"),
    )


def term_df(postings: DataFrame) -> DataFrame:
    """Document frequency per term: ``(term, df)``.

    The reference's GROUP BY word COUNT(DISTINCT document_id)
    (app/repositories/document.py:190-229); plain count suffices because
    (doc_id, term) is unique post-explode. One shuffle, map-side partial agg.
    """
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(postings_or_docs: DataFrame, dl_col: str = "dl") -> DataFrame:
    """Single-row ``(n_docs, avgdl)`` over per-doc stats.

    Feed this a *per-document* frame (e.g. ``doc_stats`` output). avgdl is
    BM25's average document length over ALL docs in scope, including
    zero-token ones.
    """
    return postings_or_docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col(dl_col)).alias("avgdl"),
    )


def with_tf(postings: DataFrame) -> DataFrame:
    """Add the reference's stored TF: ``cnt / dl``, 0 when dl == 0
    (app/repositories/document.py:165)."""
    return postings.withColumn(
        "tf",
        F.when(F.col("dl") == 0, F.lit(0.0)).otherwise(
            F.col("cnt").cast("double") / F.col("dl")
        ),
    )
