"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Emits the BASELINE.json input_hint shape:
    (repo string, path string, commit string, lang string, content string)

Generated distributed via mapInPandas with a PER-DOCUMENT seeded RNG
(``default_rng([seed, doc_idx])``), so the corpus is byte-identical under
any partitioning / parallelism — the property every determinism and
scaling test depends on. Term frequencies follow a Zipf law over ~5,000
stems, so a handful of terms land in >90% of docs (exercises the skew
path). Docs 0..5 are the §2.7-F1 edge cases (empty, punct-only,
snake_case-only, non-ASCII-only, single repeated token, very long).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_EXTS = ["py", "rs", "go", "ts", "java", "md"]
_LANGS = {"py": "python", "rs": "rust", "go": "go", "ts": "typescript",
          "java": "java", "md": "markdown"}
_KEYWORDS = ["def", "return", "if", "for", "class", "import", "fn", "func",
             "let", "const", "var", "while", "else", "try", "catch"]
_CAMEL = ["parseInput", "buildIndex", "mergeSorted", "queryEngine",
          "tokenStream", "blockMax"]
_SNAKE = ["doc_id", "term_freq", "block_size", "shard_count", "avg_dl"]

_EDGE_DOCS = [
    "",                          # empty
    "!!! ??? ... ;;; ---",       # punctuation-only -> zero tokens
    "snake_case x86_64 __init__",  # underscore-bound -> zero tokens
    "café héllo wörld привет",   # non-ASCII -> zero tokens
    "echo " * 40,                # single repeated token
    None,                        # placeholder: long doc built in-kernel
]

VOCAB_SIZE = 5000


def _vocab() -> np.ndarray:
    return np.array([f"w{i}" for i in range(VOCAB_SIZE)])


def _content_for(idx: int, seed: int, avg_tokens: int, vocab: np.ndarray) -> str:
    if idx < len(_EDGE_DOCS):
        if idx == 5:
            rng = np.random.default_rng([seed, idx])
            words = vocab[rng.zipf(1.3, size=20_000) % VOCAB_SIZE]
            return " ".join(words.tolist())  # ~100 KB doc
        return _EDGE_DOCS[idx]
    rng = np.random.default_rng([seed, idx])
    n = max(1, int(rng.poisson(avg_tokens)))
    words = vocab[rng.zipf(1.3, size=n) % VOCAB_SIZE].tolist()
    # sprinkle code-shaped lines: keywords, camelCase, snake_case, digits
    n_code = n // 10 + 1
    kw = rng.choice(_KEYWORDS, size=n_code).tolist()
    camel = rng.choice(_CAMEL, size=max(1, n_code // 2)).tolist()
    snake = rng.choice(_SNAKE, size=max(1, n_code // 2)).tolist()
    digits = [str(int(x)) for x in rng.integers(0, 10_000, size=max(1, n_code // 3))]
    parts = words + kw + camel + snake + digits
    perm = rng.permutation(len(parts))
    return " ".join(parts[i] for i in perm)


def synth_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    avg_tokens: int = 120,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus of n_docs rows."""
    vocab = _vocab()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idxs = pdf["id"].to_numpy()
            repos, paths, commits, langs, contents = [], [], [], [], []
            for idx in idxs:
                idx = int(idx)
                ext = _EXTS[idx % len(_EXTS)]
                repo = f"org{idx % 20}/repo{idx % 137}"
                path = f"src/m{idx % 57}/f{idx}.{ext}"
                commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
                repos.append(repo)
                paths.append(path)
                commits.append(commit)
                langs.append(_LANGS[ext])
                contents.append(_content_for(idx, seed, avg_tokens, vocab))
            yield pd.DataFrame(
                {"repo": repos, "path": paths, "commit": commits,
                 "lang": langs, "content": contents}
            )

    base = spark.range(n_docs, numPartitions=partitions)
    return base.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )


def with_doc_id(corpus: DataFrame) -> DataFrame:
    """Attach the engine's deterministic doc_id (SURVEY.md §7.4.3)."""
    from pyspark.sql import functions as F

    return corpus.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))


def reference_queries(n_queries: int = 50, seed: int = 7) -> list[tuple[int, list[str], int]]:
    """Seeded reference query set (FIXTURES.md §2): terms across the DF
    spectrum (Zipf head = stop-like, tail = rare) + adversarial cases."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    out = []
    for qid in range(n_queries):
        kind = qid % 5
        k = [1, 10, 50][qid % 3]
        if kind == 0:  # stop-like head terms
            terms = vocab[rng.integers(0, 5, size=rng.integers(1, 4))].tolist()
        elif kind == 1:  # mid-frequency
            terms = vocab[rng.integers(5, 200, size=rng.integers(1, 5))].tolist()
        elif kind == 2:  # rare tail
            terms = vocab[rng.integers(200, VOCAB_SIZE, size=rng.integers(1, 5))].tolist()
        elif kind == 3:  # adversarial: absent / zero-token / duplicated
            terms = [["zzznotaword"], ["snake_case"], ["w3", "w3"]][qid % 3]
        else:  # mixed head+tail
            terms = (
                vocab[rng.integers(0, 5, size=1)].tolist()
                + vocab[rng.integers(200, VOCAB_SIZE, size=2)].tolist()
            )
        out.append((qid, [str(t) for t in terms], int(k)))
    return out
