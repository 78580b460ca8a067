"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship BM25 top-k over sf0.001 documents.
queries()     — one callable per implemented operator (SURVEY.md §2 +
                the training-data-pipeline suite), from
                tfidf_spark.entrypoints.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tfidf_spark import entrypoints


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-20 docs for the
    reference query terms, via the pure-DataFrame scorer."""
    return entrypoints.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entrypoints.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entrypoints.ORACLES)
