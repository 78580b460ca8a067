"""Inverted-index build: corpus -> compressed, doc-sharded posting lists.

Scale design (the part that must survive 10^12 files):

- **One tokenize pass.** Stage 1 materializes exploded postings
  ``(doc_id, term, cnt, dl)`` to parquet in a single scan of the corpus
  (zero-token docs kept as null-term sentinel rows so N and avgdl count
  them, matching the reference's all-docs-in-scope N,
  reference app/repositories/document.py:231-255). Doc stats, corpus
  stats, and the index all derive from that materialization — the raw
  text is never re-read.
- **Doc-sharding IS the skew handling.** A hot term (``the``, ``if``,
  ``return`` in ~every code file) would otherwise funnel its whole
  posting list through one reducer. Every posting carries
  ``shard = pmod(xxhash64(doc_id), n_shards)`` and lists are built per
  (term, shard): hot terms fan out across n_shards tasks — the explicit
  salting the north_rule requires, except the salt is KEPT in the index
  key: queries process (term, shard) runs independently (disjoint doc
  sets) and merge top-k, so no single-reducer merge exists at build OR
  query time. Size n_shards so max_df/n_shards * 16B fits comfortably in
  an executor task.
- **Group assembly stays JVM-side**: ``sort_array(collect_list(...))``
  builds each (term, shard) run inside Tungsten (sign-flip docID order ==
  signed order, so sort_array's struct ordering matches the codec);
  Python sees whole runs as Arrow list columns via ONE mapInPandas pass —
  no per-group Arrow exchange (a per-group applyInPandas measured ~2ms
  of overhead per group; with vocab*shards groups that dominated the
  build).
- BM25's idf-independent weight (cnt, dl, avgdl folded in) is computed
  JVM-side and stored per posting; its per-block max is the block-max
  skip metadata. Query-time score = idf * stored weight.
- The index is written sorted by term within range partitions so parquet
  min/max statistics prune term lookups.

The materialized tables are the scalable analog of the reference's
``word_frequencies`` B-tree'd table (reference app/db/models.py:94-110):
doc_stats == its per-document rows, term_stats == its GROUP BY word view
(reference app/repositories/document.py:190-229).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

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
from tfidf_spark.operators.postings import with_term_counts
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


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: each input row is one pre-assembled, pre-sorted
    (term, shard) run with list columns ids/ws."""
    for pdf in batches:
        out = {k.name: [] for k in INDEX_SCHEMA.fields}
        for term, shard, ids, ws in zip(
            pdf["term"], pdf["shard"], pdf["ids"], pdf["ws"]
        ):
            pb, wb, block_last, block_max, n = encode_postings(
                np.asarray(ids, dtype=np.int64), np.asarray(ws, dtype=np.float64)
            )
            out["term"].append(term)
            out["shard"].append(int(shard))
            out["df_shard"].append(n)
            out["postings"].append(pb)
            out["weights"].append(wb)
            out["block_last"].append(block_last)
            out["block_max"].append(block_max)
        yield pd.DataFrame(out)


def stage_postings(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "content",
    id_col: str = "doc_id",
    code_aware: bool = False,
) -> None:
    """Stage 1: single tokenize pass -> postings parquet
    ``(doc_id, term nullable, cnt nullable, dl)``; null term marks a
    zero-token doc (kept so N/avgdl count it)."""
    counted = with_term_counts(docs, text_col, code_aware)
    exploded = counted.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer("term_counts").alias("term", "cnt"),
        F.col("dl"),
    )
    exploded.write.mode("overwrite").parquet(f"{out_dir}/postings")


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

    Layout: postings/, doc_stats/, term_postings/, term_stats/ (parquet)
    + manifest.json (N, avgdl, params, per-stage metrics + wall times —
    the lineage analog of the reference's Valkey metrics,
    reference app/services/metrics.py:10-63).
    """
    spark = docs.sparkSession
    walls: dict[str, float] = {}

    t0 = time.perf_counter()
    stage_postings(docs, out_dir, text_col, id_col, code_aware)
    walls["stage_postings_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    raw = spark.read.parquet(f"{out_dir}/postings")
    doc_stats = raw.groupBy("doc_id").agg(
        F.max("dl").alias("dl"),
        F.count("term").alias("n_unique"),  # count() skips nulls
    )
    doc_stats.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
    cs = (
        spark.read.parquet(f"{out_dir}/doc_stats")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    n_docs, avgdl = int(cs["n"]), float(cs["avgdl"] or 0.0)
    walls["stage_doc_stats_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    postings = raw.filter(F.col("term").isNotNull()).withColumn(
        "w", bm25_weight_expr("cnt", "dl", avgdl if avgdl > 0 else 1.0, k1, b)
    )
    sharded = postings.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")
    )
    runs = (
        sharded.groupBy("term", "shard")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "w"))).alias("plist"))
        .select(
            "term",
            "shard",
            F.col("plist.doc_id").alias("ids"),
            F.col("plist.w").alias("ws"),
        )
    )
    index_df = runs.mapInPandas(_encode_batches, INDEX_SCHEMA)
    nparts = index_partitions or max(1, spark.sparkContext.defaultParallelism)
    (
        index_df.repartitionByRange(nparts, "term", "shard")
        .sortWithinPartitions("term", "shard")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_postings")
    )
    walls["stage_encode_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    tp = spark.read.parquet(f"{out_dir}/term_postings")
    tp.groupBy("term").agg(F.sum("df_shard").alias("df")).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/term_stats")
    stats = tp.agg(
        F.sum("df_shard").alias("n_postings"),
        F.sum(F.length("postings") + F.length("weights")).alias("bytes"),
    ).collect()[0]
    walls["stage_term_stats_sec"] = round(time.perf_counter() - t0, 3)

    manifest = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_shards": n_shards,
        "k1": k1,
        "b": b,
        "code_aware": code_aware,
        "metrics": {
            "docs_tokenized": n_docs,
            "postings_emitted": int(stats["n_postings"] or 0),
            "bytes_compressed": int(stats["bytes"] or 0),
            **walls,
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
