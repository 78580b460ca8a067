"""Text analysis operators for training-data quality pipelines: token
counting, quality scoring, language-ID heuristic, fingerprinting.

All operate on posting rows ``(doc_id, term, cnt[, dl])`` from
operators/postings.py — one tokenize pass feeds every analysis — and stay
JVM-side (grouped integer arithmetic), so they ride along the index build
at marginal cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]


def token_quality(postings: DataFrame, stopwords: list[str] | None = None) -> DataFrame:
    """Per-doc quality signals: token counts, stopword ratio, mean token
    length. Low stopword ratio + extreme token lengths flag non-prose."""
    stopwords = stopwords or DEFAULT_STOPWORDS
    stop = F.col("term").isin(stopwords)
    return postings.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.round(
            F.sum(F.when(stop, F.col("cnt")).otherwise(0)).cast("double") / F.sum("cnt"),
            4,
        ).alias("stop_ratio_r"),
        F.round(
            F.sum(F.length("term") * F.col("cnt")).cast("double") / F.sum("cnt"), 4
        ).alias("avg_token_len_r"),
    )


def lang_id(
    docs: DataFrame,
    postings: DataFrame,
    markers: dict[str, list[str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Marker-word language ID: argmax of marker-hit counts, tie lang asc,
    'und' when nothing matches. ``markers`` is the profile table — swap in
    real per-language frequency profiles without touching the plan shape
    (score -> argmax window -> left join)."""
    spark = docs.sparkSession
    mdf = spark.createDataFrame(
        [(lang, t) for lang, ts in markers.items() for t in ts],
        "mlang string, term string",
    )
    hits = (
        postings.join(F.broadcast(mdf), "term")
        .groupBy("doc_id", "mlang")
        .agg(F.sum("cnt").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("mlang"))
    best = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return docs.select(F.col(id_col).alias("doc_id")).join(best, "doc_id", "left").select(
        "doc_id", F.coalesce("mlang", F.lit("und")).alias("pred_lang")
    )


def chargram_fingerprint(
    docs: DataFrame,
    gram: int = 16,
    stride: int = 4,
    text_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cg_fp): windowed character-gram fingerprint — the min hash
    over all ``gram``-char windows sampled every ``stride`` chars
    (winnowing-style rolling fingerprint). Pure JVM HOFs (sequence ->
    substring -> md5 -> array_min); docs shorter than ``gram`` get NULL."""
    windows = F.transform(
        F.sequence(F.lit(1), F.length(text_col) - (gram - 1), F.lit(stride)),
        lambda i: F.md5(F.col(text_col).substr(i, F.lit(gram))),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.length(text_col) >= gram, F.array_min(windows)
        ).alias("cg_fp"),
    )


def fingerprints(docs: DataFrame, shingles: DataFrame,
                 text_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, content_sha256, min_shingle_md5): exact identity hash +
    a locality-sensitive min-shingle fingerprint."""
    mins = shingles.groupBy("doc_id").agg(F.min(F.md5("s")).alias("min_shingle_md5"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.sha2(text_col, 256).alias("content_sha256"))
        .join(mins, "doc_id", "left")
    )
