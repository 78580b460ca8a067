"""Tokenizer golden tests — the §2.7-F1 quirks of the reference regex
(reference: app/services/text_processing.py:18). These cases are exactly
where Java regex \\b diverges from Python re, so they pin the contract."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tfidf_spark.functions.tokenize import (
    TOKEN_PATTERN,
    py_tokenize,
    py_tokenize_code_aware,
    tokenize_udf,
)

GOLDEN = [
    ("Hello World", ["hello", "world"]),
    ("snake_case", []),                # _ is a word char: \b never fires
    ("x86_64", []),
    ("café", []),                      # é is a word char (Unicode re)
    ("héllo wörld", []),
    ("camelCase", ["camelcase"]),      # lowered before matching
    ("os.path.join", ["os", "path", "join"]),
    ("utf-8", ["utf", "8"]),
    ("a  b\t\nc", ["a", "b", "c"]),
    ("123 4a5", ["123", "4a5"]),
    ("", []),
    (None, []),
    ("!!! ??? ...", []),
    ("don't", ["don", "t"]),
]

GOLDEN_CODE_AWARE = [
    ("snake_case", ["snake", "case"]),
    ("x86_64", ["x86", "64"]),
    ("camelCaseName", ["camel", "case", "name"]),
    ("HTTPServer", ["httpserver"]),    # consecutive uppers: no hump boundary
    ("parseJSON2x", ["parse", "json2x"]),
]


def test_pattern_is_reference_verbatim():
    assert TOKEN_PATTERN == r"\b[a-z0-9]+\b"
    # sanity: reference semantics = findall over lowered text
    assert re.findall(TOKEN_PATTERN, "Hello World".lower()) == ["hello", "world"]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_py_tokenize_golden(text, expected):
    assert py_tokenize(text) == expected


@pytest.mark.parametrize("text,expected", GOLDEN_CODE_AWARE)
def test_code_aware_golden(text, expected):
    assert py_tokenize_code_aware(text) == expected


def test_udf_matches_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(GOLDEN)], "i int, content string"
    )
    rows = (
        df.select("i", tokenize_udf()(F.col("content")).alias("toks"))
        .orderBy("i")
        .collect()
    )
    for row, (_, expected) in zip(rows, GOLDEN):
        assert row["toks"] == expected
