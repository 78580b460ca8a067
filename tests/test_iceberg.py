"""Iceberg-source seam tests.

This container ships NO iceberg-spark-runtime jar (documented gap —
VERDICT r01 #7), so the Iceberg read path itself cannot execute here.
What CAN be verified, and is, because the cluster deployment depends on
it:

- format routing + the clear failure mode when the jar is absent,
- the snapshot fingerprint contract (what keys build resume),
- the CLI wiring: load_corpus's fingerprint reaches
  build_index(source_snapshot=...) so a re-submitted job resumes, and a
  different snapshot invalidates — exercised in-process through
  tools/submit_build.main() on real parquet.
"""

from __future__ import annotations

import json
import sys

import pytest

from tfidf_spark.sources.catalog import iceberg_available, load_corpus


def test_no_iceberg_runtime_in_sandbox(spark):
    assert iceberg_available(spark) is False


def test_parquet_fingerprint_contract(spark):
    df, fp = load_corpus(spark, "/root/testdata/sf0.001/documents.parquet")
    assert fp == "parquet:/root/testdata/sf0.001/documents.parquet"
    assert df.limit(1).count() == 1


def test_iceberg_without_jar_raises_clearly(spark):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_corpus(spark, "catalog.db.corpus", fmt="iceberg")


def test_auto_routes_paths_to_parquet(spark):
    # a path (has '/') must never be treated as an Iceberg table name
    df, fp = load_corpus(spark, "/root/testdata/sf0.001/documents.parquet", fmt="auto")
    assert fp.startswith("parquet:")


def _run_cli(argv: list[str], capsys) -> dict:
    from tools import submit_build

    old = sys.argv
    sys.argv = ["submit_build.py"] + argv
    try:
        submit_build.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_wires_fingerprint_into_resume(spark, tmp_path, capsys):
    """build twice with --resume: the second run must skip every stage
    because the source fingerprint (not a hand-passed id) keys the
    checkpoints; pinning a different --snapshot invalidates them."""
    out_dir = str(tmp_path / "cli_idx")
    args = [
        "build",
        "--corpus", "/root/testdata/sf0.001/documents.parquet",
        "--out", out_dir,
        "--text-col", "text",
        "--n-shards", "2",
        "--resume",
    ]
    m1 = _run_cli(args, capsys)
    assert m1["source_fingerprint"].startswith("parquet:")
    assert m1["metrics"]["stage_postings_sec"] > 0

    m2 = _run_cli(args, capsys)
    for stage in ("postings", "doc_stats", "encode", "term_stats"):
        assert m2["metrics"][f"stage_{stage}_sec"] == 0.0, stage
    assert m2["n_docs"] == m1["n_docs"]

    m3 = _run_cli(args + ["--snapshot", "corpus-v2"], capsys)
    assert m3["metrics"]["stage_postings_sec"] > 0  # new version: full re-run
