"""Driver-contract smoke: every queries() entry runs at sf0.001 and its
oracle SQL parses and runs in DuckDB (full value comparison is
tools/check_oracles.py at sf0.01 — this keeps the contract importable and
runnable from pytest)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


# Entries deliberately without a SQL oracle (driver records rows-only):
# none — huffman_transfer gained a round-trip oracle in round 3 (the
# query emits sha256 of encode->decode output; DuckDB checks sha256(text)),
# so every queries() entry is hash-gated.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    missing = set(qs) - set(oracles) - ROWS_ONLY
    assert not missing, f"rows-only queries (document if intentional): {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_and_oracle_agree_on_shape(spark, duck, name):
    if name in ROWS_ONLY:
        got = entry_mod.queries()[name](spark, SF_DIR).limit(5).collect()
        assert got and len(got[0]) >= 2  # runs end-to-end, stable schema
        return
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    got = sdf.limit(5).collect()  # runs the plan
    duck_cols = sorted(
        duck.execute(f"SELECT * FROM ({entry_mod.oracle_sql()[name]}) LIMIT 0")
        .fetchdf()
        .columns
    )
    assert spark_cols == duck_cols, name
    assert got is not None


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score_r"]
