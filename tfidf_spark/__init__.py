"""tfidf_spark — a PySpark-native inverted-index + BM25 analytics engine.

A from-scratch Spark engine with the query semantics of the reference
TF-IDF service (FwuffFox/TFIDF, surveyed in SURVEY.md): reference-exact
tokenization, TF / DF / IDF / TF-IDF statistics, scoped collection
statistics, top-k ranking — re-architected Spark-first:

- declarative DataFrame plans (Catalyst does pushdown / pruning / partial agg)
- Arrow-vectorized pandas UDFs for the two custom kernels
  (tokenize+count, posting-list encode/score); no per-row Python
- compressed posting-list index (delta + varint + block-max skip metadata)
- explicit salting for skewed high-DF terms
- deterministic doc ids + tie-breaks so ranks are reproducible under
  any parallelism

Layout:
    functions/   scalar/vectorized functions (tokenizers, portable hashes)
    operators/   composable DataFrame operators (postings, scoring, dedup,
                 similarity, text stats, relational ops)
    index/       posting-list codec, index builder, block-max WAND query
    sources/     corpus loading/synthesis (parquet now, Iceberg-ready)
    streaming/   incremental ingest (Structured Streaming)
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
