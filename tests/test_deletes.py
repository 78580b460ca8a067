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

def test_patch_deletes_equals_full_compact(spark, corpus, tmp_path):
    """Targeted compaction must be RESULT-IDENTICAL to full_compact on
    the same snapshot (same n_docs, same corrected df, same top-k ranks
    AND scores), while writing only the affected runs."""
    import os

    from tfidf_spark.index.incremental import (
        decode_runs,
        full_compact,
        patch_deletes,
    )

    out = str(tmp_path / "idx3")
    build_index(corpus, out, n_shards=4)
    idx = load_index(spark, out)
    before = bm25_query_terms(idx, ["w0", "w1"], k=10).collect()
    victims = [r["doc_id"] for r in before[:3]]
    delete_docs(idx, victims)

    full_dir = str(tmp_path / "fc3")
    fm = full_compact(load_index(spark, out), full_dir)

    seg = os.path.join(out, "term_postings")
    mtimes = {f: os.path.getmtime(os.path.join(seg, f)) for f in os.listdir(seg)}
    patch_dir = str(tmp_path / "pd3")
    pm = patch_deletes(load_index(spark, out), patch_dir)
    after = {f: os.path.getmtime(os.path.join(seg, f)) for f in os.listdir(seg)}
    assert mtimes == after, "base segment files were rewritten"

    assert pm["n_docs"] == fm["n_docs"] == 100 - 3
    # O(affected runs): bytes written are a strict fraction of the index
    base_bytes = idx.manifest["metrics"]["bytes_compressed"]
    assert 0 < pm["metrics"]["bytes_written_postings"] < base_bytes
    assert pm["metrics"]["runs_patched"] >= 1

    pidx = load_index(spark, patch_dir)
    fidx = load_index(spark, full_dir)
    # corrected term stats agree exactly with the full rewrite's recompute
    p_ts = {r["term"]: r["df"] for r in pidx.term_stats.collect()}
    f_ts = {r["term"]: r["df"] for r in fidx.term_stats.collect()}
    assert p_ts == f_ts
    # victims are physically gone from the patched view of the postings
    remaining = {
        r["doc_id"]
        for r in decode_runs(pidx.term_postings).select("doc_id").distinct().collect()
    }
    assert not (set(victims) & remaining)
    # rank- and score-identical top-k
    for terms in (["w0", "w1"], ["w3", "w7"], ["w0"]):
        pr = [(r["doc_id"], round(r["score"], 9))
              for r in bm25_query_terms(pidx, terms, k=10).collect()]
        fr = [(r["doc_id"], round(r["score"], 9))
              for r in bm25_query_terms(fidx, terms, k=10).collect()]
        assert pr == fr, terms


def test_patch_deletes_then_merge_and_move(spark, corpus, tmp_path):
    """A patched snapshot composes with the rest of the lifecycle: an
    incremental merge on top carries the shadow list (deleted docs stay
    gone), and the whole chain still moves as a unit."""
    import shutil

    from tfidf_spark.index.incremental import compact_index, patch_deletes

    root = tmp_path / "proot"
    base = corpus.filter(F.col("doc_id") % 4 != 0)
    delta = corpus.filter(F.col("doc_id") % 4 == 0)
    build_index(base, str(root / "s0"), n_shards=4)
    idx = load_index(spark, str(root / "s0"))
    victims = [
        r["doc_id"] for r in bm25_query_terms(idx, ["w0"], k=3).collect()
    ]
    delete_docs(idx, victims)
    patch_deletes(load_index(spark, str(root / "s0")), str(root / "s1"))

    compact_index(
        load_index(spark, str(root / "s1")), delta, str(root / "s2"), force=True
    )
    merged = load_index(spark, str(root / "s2"))
    hits = {
        r["doc_id"]
        for r in bm25_query_terms(merged, ["w0", "w1"], k=200).collect()
    }
    assert not (hits & set(victims)), "patched deletes resurfaced after merge"
    expected = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_query_terms(merged, ["w0", "w1"], k=10).collect()
    ]

    moved = tmp_path / "proot_moved"
    shutil.move(str(root), str(moved))
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_query_terms(
            load_index(spark, str(moved / "s2")), ["w0", "w1"], k=10
        ).collect()
    ]
    assert got == expected
