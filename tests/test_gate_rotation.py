"""Local smoke gate for ROTATION-TAIL registry entries (ADVICE r6).

The driver's correctness gate only checks the first 50 ``queries()``
entries, so entries rotated past the window would otherwise go a round
with no check at all. This test runs every tail entry against its
DuckDB oracle at sf0.001 with the driver's own comparison semantics
(row count, sorted column names, order-insensitive values), so a
regression in a rotated entry still fails the local suite the round it
happens.

The tail is discovered from the registry (everything past entry 50), so
this test tracks future rotations without edits.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry_mod  # noqa: E402

_SPEC = importlib.util.spec_from_file_location(
    "check_oracles",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracles.py"),
)
check_oracles = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_oracles)

SF_DIR = os.environ.get("TFIDF_TEST_SF_DIR", "/root/testdata/sf0.001")
GATE_WINDOW = 50

_tail = list(entry_mod.queries())[GATE_WINDOW:]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in check_oracles.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_tail_entries_all_have_oracles_or_are_documented():
    oracles = entry_mod.oracle_sql()
    missing = [k for k in _tail if k not in oracles]
    assert missing == [], (
        f"rotation-tail entries without oracles cannot be smoke-checked: "
        f"{missing}"
    )


@pytest.mark.parametrize("name", _tail)
def test_rotated_entry_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(oracle).fetchdf()
    problems = check_oracles.compare(name, spark_pdf, duck_pdf)
    assert problems == [], f"{name}: {problems}"
