"""Custom stateful streaming operator: exact dedup across microbatches
(SURVEY.md §2.9 / driver brief "applyInPandasWithState for custom
stateful operators").

The reference's upload path rejects a document whose content hash was
already ingested (reference app/controllers/document.py:147-156, unique
hash column app/db/models.py:78). On a stream, that check is STATEFUL:
whether a hash was seen lives in keyed state that must survive
microbatch boundaries and restarts (checkpointed by Structured
Streaming). This is the scalable form: state is partitioned by
content hash across executors, so the dedup table never lives on one
node.

Determinism contract (order-independent WITHIN a microbatch, first-arrival
ACROSS microbatches):

- Within one microbatch the keeper is the minimum doc_id of the hash's
  rows — computed over ALL Arrow chunks of the group, so the result
  cannot depend on Arrow batch slicing.
- Across microbatches the keeper is the first microbatch's keeper
  ("first arrival"): once state records a keeper, every later row for
  that hash is a dup, exactly like the reference's 409-on-duplicate
  upload (reference app/controllers/document.py:147-156). Microbatch
  order follows the source's file-listing order, which callers control
  (one file per logical batch ⇒ fully deterministic).
- `is_dup=False` is emitted for EXACTLY ONE row per hash, ever — the
  first occurrence of the keeper doc_id in its first microbatch, even
  if the keeper row itself is duplicated within that batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "content_sha256 string, doc_id long, keeper_id long, is_dup boolean"
)
_STATE_SCHEMA = "keeper_id long, n_seen long"


def _dedup_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Buffer every chunk of the group before choosing the keeper: one
    # content hash can span multiple Arrow chunks, and the min doc_id
    # must be the GLOBAL min of the microbatch, not the first chunk's.
    # Memory is bounded by the per-hash duplicate count within one
    # microbatch (small by construction — dups of a single document),
    # not by the microbatch size.
    keeper, n_seen = state.get if state.exists else (None, 0)
    ids_chunks = [
        pdf["doc_id"].astype("int64") for pdf in pdfs if len(pdf)
    ]
    if not ids_chunks:
        state.update((keeper, n_seen))
        return
    ids = pd.concat(ids_chunks, ignore_index=True)
    if keeper is None:
        keeper = int(ids.min())
    is_dup = pd.Series(True, index=ids.index)
    if n_seen == 0:
        # exactly one non-dup row ever: the keeper's FIRST occurrence
        keeper_rows = ids.index[ids == keeper]
        is_dup.loc[keeper_rows[0]] = False
    n_seen += len(ids)
    state.update((keeper, n_seen))
    yield pd.DataFrame(
        {
            "content_sha256": key[0],
            "doc_id": ids,
            "keeper_id": keeper,
            "is_dup": is_dup,
        }
    )


def stream_dedup_exact(
    corpus_stream: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(content_sha256, doc_id, keeper_id, is_dup) per arriving doc —
    is_dup=False exactly once per distinct content hash, ever (the
    streaming analog of the reference's 409-on-duplicate upload)."""
    hashed = corpus_stream.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("content_sha256"),
    )
    return hashed.groupBy("content_sha256").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
