"""Tombstone deletes: query-time filtering matches an index rebuilt
without the docs (ranks; scores keep pre-delete statistics until
compaction — documented drift policy), and physical compaction removes
them from the runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfidf_spark.index.builder import build_index, load_index
from tfidf_spark.index.incremental import compact_deletes, delete_docs
from tfidf_spark.index.query import bm25_query_terms
from tfidf_spark.sources.corpus import synth_corpus, with_doc_id


@pytest.fixture(scope="module")
def corpus(spark):
    df = with_doc_id(synth_corpus(spark, 100, partitions=4)).cache()
    df.count()
    return df


def test_tombstones_filter_queries(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index(corpus, out, n_shards=4)
    idx = load_index(spark, out)

    before = bm25_query_terms(idx, ["w0", "w1"], k=10).collect()
    victims = [r["doc_id"] for r in before[:3]]
    assert delete_docs(idx, victims) == 3

    after = bm25_query_terms(idx, ["w0", "w1"], k=10).collect()
    got_ids = [r["doc_id"] for r in after]
    assert not (set(victims) & set(got_ids))
    assert len(after) == 10  # over-fetch prevented under-fill
    # survivors keep their relative order and scores
    survivors = [r for r in before if r["doc_id"] not in victims]
    assert got_ids[: len(survivors)] == [r["doc_id"] for r in survivors][:10]


def test_compact_deletes_physically_removes(spark, corpus, tmp_path):
    out = str(tmp_path / "idx2")
    build_index(corpus, out, n_shards=4)
    idx = load_index(spark, out)
    victims = [r["doc_id"] for r in corpus.limit(5).collect()]
    delete_docs(idx, victims)

    compacted_dir = str(tmp_path / "compacted")
    manifest = compact_deletes(idx, compacted_dir)
    assert manifest["n_docs"] == 100 - 5
    cidx = load_index(spark, compacted_dir)
    assert cidx.n_tombstones == 0

    from tfidf_spark.index.incremental import decode_runs

    remaining = {
        r["doc_id"] for r in decode_runs(cidx.term_postings).select("doc_id").distinct().collect()
    }
    assert not (set(victims) & remaining)
    # df corrected: every term's df equals its decoded run lengths
    dfs = {r["term"]: r["df"] for r in cidx.term_stats.collect()}
    counts = {
        r["term"]: r["n"]
        for r in decode_runs(cidx.term_postings)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dfs == counts
