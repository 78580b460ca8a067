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

Determinism: the keeper is the first-seen doc; within one microbatch
(no arrival order) the minimum doc_id wins — the engine-wide tie-break.
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
    keeper, n_seen = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        ids = pdf["doc_id"].astype("int64")
        batch_min = int(ids.min())
        if keeper is None:
            keeper = batch_min
        out = pd.DataFrame(
            {
                "content_sha256": key[0],
                "doc_id": ids,
                "keeper_id": keeper,
                "is_dup": (ids != keeper) | (n_seen > 0),
            }
        )
        # every row after the keeper's first sighting is a dup, including
        # a re-upload of the keeper doc itself in a later batch
        out.loc[(ids == keeper) & (n_seen == 0), "is_dup"] = False
        n_seen += len(pdf)
        yield out
    state.update((keeper, n_seen))


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
