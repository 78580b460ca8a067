"""Inverted-index build: corpus -> compressed, doc-sharded posting lists.

Scale design (the part that must survive 10^12 files):

- **Doc-sharding IS the skew handling.** A hot term (``the``, ``if``,
  ``return`` appear in ~every code file) would otherwise funnel its entire
  posting list through one reducer. Here every posting carries
  ``shard = pmod(xxhash64(doc_id), n_shards)``, the encode kernel runs per
  (term, shard), and hot terms fan out across n_shards tasks — this is the
  explicit salting the north_rule requires, except the salt is *kept* in
  the index key instead of merged away: queries process (term, shard) runs
  independently (disjoint doc sets) and merge top-k, so no single-reducer
  merge step ever exists, at build OR query time.
- The encode kernel receives Arrow batches via applyInPandas and runs the
  numpy codec — no per-row Python.
- The index is written sorted by term within range partitions, so parquet
  min/max statistics prune term lookups at query time.
- BM25's idf-independent weight (cnt, dl, avgdl already folded in) is
  precomputed JVM-side and stored per posting; block_max over it is the
  skip metadata. Query-time score = idf * stored weight.

The materialized tables are the scalable analog of the reference's
``word_frequencies`` B-tree'd table (reference: app/db/models.py:94-110):
doc_stats == its per-document rows, term_stats == its GROUP BY word view
(app/repositories/document.py:190-229).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tfidf_spark import BM25_B, BM25_K1
from tfidf_spark.index.codec import encode_postings
from tfidf_spark.operators.postings import corpus_stats, explode_postings, with_term_counts
from tfidf_spark.operators.scoring import bm25_weight_expr

INDEX_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("shard", IntegerType()),
        StructField("df_shard", LongType()),
        StructField("postings", BinaryType()),
        StructField("weights", BinaryType()),
        StructField("block_last", ArrayType(LongType())),
        StructField("block_max", ArrayType(DoubleType())),
    ]
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    w = pdf["w"].to_numpy(dtype=np.float64)
    pb, wb, block_last, block_max, n = encode_postings(ids, w)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "shard": [int(pdf["shard"].iloc[0])],
            "df_shard": [n],
            "postings": [pb],
            "weights": [wb],
            "block_last": [block_last],
            "block_max": [block_max],
        }
    )


def build_index(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "content",
    id_col: str = "doc_id",
    n_shards: int = 8,
    code_aware: bool = False,
    k1: float = BM25_K1,
    b: float = BM25_B,
    index_partitions: int | None = None,
) -> dict:
    """Build the full index at ``out_dir``. Returns the manifest dict.

    Layout: doc_stats/, term_postings/, term_stats/ (parquet dirs) +
    manifest.json (N, avgdl, params, per-stage metrics — the lineage analog
    of the reference's Valkey metrics, app/services/metrics.py:10-63).
    """
    spark = docs.sparkSession
    counted = with_term_counts(docs, text_col, code_aware)

    stats_df = counted.select(
        F.col(id_col).alias("doc_id"),
        F.col("dl"),
        F.size("term_counts").alias("n_unique"),
    )
    stats_df.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
    stats_df = spark.read.parquet(f"{out_dir}/doc_stats")  # reuse, don't re-tokenize

    cs = corpus_stats(stats_df).collect()[0]
    n_docs, avgdl = int(cs["n_docs"]), float(cs["avgdl"] or 0.0)

    postings = explode_postings(counted, id_col).withColumn(
        "w", bm25_weight_expr("cnt", "dl", avgdl if avgdl > 0 else 1.0, k1, b)
    )
    sharded = postings.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")
    )
    index_df = sharded.groupBy("term", "shard").applyInPandas(_encode_group, INDEX_SCHEMA)

    nparts = index_partitions or max(1, spark.sparkContext.defaultParallelism)
    (
        index_df.repartitionByRange(nparts, "term", "shard")
        .sortWithinPartitions("term", "shard")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_postings")
    )

    tp = spark.read.parquet(f"{out_dir}/term_postings")
    tp.groupBy("term").agg(F.sum("df_shard").alias("df")).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/term_stats")

    n_postings = tp.agg(F.sum("df_shard")).collect()[0][0] or 0
    bytes_compressed = tp.agg(
        F.sum(F.length("postings") + F.length("weights"))
    ).collect()[0][0] or 0
    manifest = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_shards": n_shards,
        "k1": k1,
        "b": b,
        "code_aware": code_aware,
        "metrics": {
            "docs_tokenized": n_docs,
            "postings_emitted": int(n_postings),
            "bytes_compressed": int(bytes_compressed),
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class IndexHandle:
    """Loaded index: lazily-read DataFrames + collected scalars."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = self.manifest["avgdl"]
        self.k1 = self.manifest["k1"]
        self.b = self.manifest["b"]

    @property
    def term_postings(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/term_postings")

    @property
    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/term_stats")

    @property
    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/doc_stats")


def load_index(spark: SparkSession, path: str) -> IndexHandle:
    return IndexHandle(spark, path)
