"""Code-aware analysis mode end-to-end: identifiers like snake_case and
camelCase — ZERO tokens under the reference regex — become searchable,
while the default mode stays reference-exact (SURVEY.md §2.7-F1)."""

from __future__ import annotations

import pytest

from tfidf_spark.index.builder import build_index, load_index
from tfidf_spark.index.query import bm25_query_terms

DOCS = [
    (1, "def buildIndex(doc_id): return block_max"),
    (2, "plain prose about engines and indexes"),
    (3, "snake_case only here: term_freq shard_count"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, content string")


def test_reference_mode_cannot_see_identifiers(spark, docs, tmp_path):
    out = str(tmp_path / "ref")
    m = build_index(docs, out, n_shards=2, code_aware=False)
    idx = load_index(spark, out)
    # camelCase lowers to ONE token (§2.7-F1): whole word findable...
    assert [r["doc_id"] for r in bm25_query_terms(idx, ["buildindex"], k=5).collect()] == [1]
    # ...but its parts are not, and underscore-bound words vanish entirely
    assert bm25_query_terms(idx, ["build"], k=5).collect() == []
    assert bm25_query_terms(idx, ["shard"], k=5).collect() == []
    assert bm25_query_terms(idx, ["snake"], k=5).collect() == []
    # doc 3 is all snake_case -> zero tokens, but still counts toward N
    assert m["n_docs"] == 3


def test_code_aware_mode_finds_identifier_parts(spark, docs, tmp_path):
    out = str(tmp_path / "code")
    build_index(docs, out, n_shards=2, code_aware=True)
    idx = load_index(spark, out)
    # camelCase split: buildIndex -> build, index
    hits = [r["doc_id"] for r in bm25_query_terms(idx, ["build", "index"], k=5).collect()]
    assert 1 in hits
    # snake_case split: shard_count -> shard, count
    assert [r["doc_id"] for r in bm25_query_terms(idx, ["shard"], k=5).collect()] == [3]
    assert [r["doc_id"] for r in bm25_query_terms(idx, ["term", "freq"], k=5).collect()][0] == 3
