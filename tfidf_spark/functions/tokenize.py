"""Tokenizers — the reference scoring contract's foundation.

The reference tokenizer (reference: app/services/text_processing.py:18) is

    re.findall(r"\\b[a-z0-9]+\\b", text.lower())

run under Python ``re`` with Unicode word-boundary semantics. That exact
engine matters: ``_`` and non-ASCII letters are word characters, so
``snake_case`` and ``café`` tokenize to ZERO tokens, while ``camelCase``
lowers first and yields one token ``camelcase``. Java's regex ``\\b``
disagrees on those inputs, so we must NOT use ``F.regexp_extract_all`` —
the vectorized pandas UDFs below run Python ``re`` inside Arrow batches,
giving bit-identical token streams at JVM-shuffle cost only.

``py_tokenize_code_aware`` is the additional analysis mode (north_star
"code-aware tokenization"): split ``_`` and camelCase humps BEFORE the
reference regex, so identifiers contribute searchable terms. Rank-identity
verification against the reference always uses the verbatim mode.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, MapType, StringType

# Verbatim pattern from reference app/services/text_processing.py:18.
TOKEN_PATTERN = r"\b[a-z0-9]+\b"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# camelCase hump boundary: lower/digit followed by upper. Applied before
# lowering, plus '_' -> ' ' so the reference regex sees word boundaries.
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")


def py_tokenize(text: str | None) -> list[str]:
    """Reference-exact tokenization (driver-side / oracle use)."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def py_tokenize_code_aware(text: str | None) -> list[str]:
    """Code-aware mode: split snake_case and camelCase, then reference regex."""
    if not text:
        return []
    return _TOKEN_RE.findall(_CAMEL_RE.sub(" ", text.replace("_", " ")).lower())


def _tokenize_series(s: pd.Series, code_aware: bool) -> pd.Series:
    s = s.fillna("")
    if code_aware:
        s = s.str.replace("_", " ", regex=False).str.replace(_CAMEL_RE, " ", regex=True)
    # pandas .str.findall dispatches to Python re -> identical semantics.
    return s.str.lower().str.findall(_TOKEN_RE)


def tokenize_udf(code_aware: bool = False):
    """Arrow-vectorized ``content -> array<string>`` token stream."""

    @pandas_udf(ArrayType(StringType()))
    def _tok(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield _tokenize_series(s, code_aware)

    return _tok


def shingles_udf(n: int = 3, code_aware: bool = False):
    """Arrow-vectorized ``content -> array<string>`` of DISTINCT word
    n-gram shingles (space-joined). Deduping inside the kernel keeps the
    downstream explode minimal — shingles feed MinHash/Jaccard dedup where
    only set membership matters."""

    @pandas_udf(ArrayType(StringType()))
    def _shingle(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            toks = _tokenize_series(s, code_aware)
            yield toks.map(
                lambda ts: list(
                    dict.fromkeys(
                        " ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)
                    )
                )
                if len(ts) >= n
                else []
            )

    return _shingle


def tokenize_counts_udf(code_aware: bool = False):
    """Arrow-vectorized ``content -> map<term, count>``.

    Counting inside the UDF is the map-side combine for the postings build:
    each (doc, term) pair leaves the kernel already unique, so no
    ``groupBy(doc_id, term)`` shuffle is ever needed — the only shuffle in
    the whole index build is the term-level aggregation. That is the
    property that survives a 100 TB corpus.
    """

    @pandas_udf(MapType(StringType(), IntegerType()))
    def _tok_counts(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            toks = _tokenize_series(s, code_aware)
            yield toks.map(lambda ts: dict(Counter(ts)))

    return _tok_counts
