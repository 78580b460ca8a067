"""Deterministic, engine-portable hashing helpers.

- ``doc_id_expr``: stable 64-bit doc ids from natural keys via xxhash64,
  replacing the reference's uuid4 PKs (reference: app/db/models.py:73-74)
  which are non-deterministic and would break rank-identity and resumable
  merges under parallelism (SURVEY.md §7.4.3).
- ``content_sha256``: the per-row content-fidelity invariant
  (BASELINE.json input_hint), replacing the reference's salted md5 dedup
  key (reference: app/services/__init__.py:1-17).
- ``portable_min_hash_expr``: MinHash built on md5 hex strings, chosen
  because md5 is bit-identical across Spark, DuckDB and Python — the
  signatures are therefore oracle-checkable. Ordering md5 hex strings
  lexicographically is a valid uniform hash order (hex of a uniform
  128-bit value), so ``min(md5(seed || shingle))`` is a proper MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def doc_id_expr(*natural_key_cols: str | Column) -> Column:
    """64-bit deterministic doc id from natural keys (e.g. repo,path,commit)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in natural_key_cols]
    return F.xxhash64(*cols)


def content_sha256(content_col: str | Column = "content") -> Column:
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    return F.sha2(c, 256)


def portable_min_hash_expr(shingles_col: Column, seed: int) -> Column:
    """min over shingles of md5(seed:shingle) — a portable MinHash component.

    Returns a 32-hex-char string; NULL when the shingle array is empty.
    """
    return F.array_min(
        F.transform(
            shingles_col,
            lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)),
        )
    )
