"""Incremental index maintenance, Lucene/Iceberg segment style: merging
new documents appends a DELTA SEGMENT and a new manifest — old segments
are carried over BY REFERENCE, never decoded, never rewritten.

This is the scalable analog of the reference's per-upload index insert
(reference app/repositories/document.py:148-173: each new document adds
its posting rows) and the cascade-delete maintenance note
(SURVEY.md §2.6). I/O and CPU are both proportional to the DELTA:

- ``compact_index(delta)`` tokenizes + encodes ONLY the delta's postings
  into ``out_dir/term_postings`` and lists the base snapshot's segment
  directories in the new manifest (``segments``) — at 100 TB the merge
  writes megabytes while the index stays at terabytes. The only
  O(index)-adjacent work is re-aggregating ``term_stats`` (one row per
  term — O(vocabulary), not O(postings); parquet column pruning means
  the posting blobs are never read).
- Queries see multiple runs per (term, shard) — one per segment — and
  the MaxScore kernel scores each run as an independent list. Exactness
  is preserved because segments hold DISJOINT doc sets (the re-ingest
  guard enforces it): every doc contributes to a term's score from
  exactly one run, and extra per-run upper bounds only loosen pruning
  (never unsound).
- ``full_compact`` / ``compact_deletes`` is the MAJOR compaction: decode
  the union of segments, drop tombstoned docs, re-encode into a fresh
  single-segment snapshot. Run it when segment count or tombstone
  fraction justifies the rewrite (manifest carries both counters).

BM25 weight consistency: stored weights fold in avgdl at encode time.
Increments PIN the base index's avgdl (so all runs score consistently)
and track the drift between pinned and true avgdl in the manifest;
when |drift| exceeds ``rebuild_threshold`` (default 10%) the caller
should schedule a full rebuild — compact() raises unless forced.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfidf_spark.index.builder import (
    FORMAT_VERSION,
    INDEX_SCHEMA,
    IndexHandle,
    _encode_sorted_stream,
)
from tfidf_spark.operators.postings import with_term_counts
from tfidf_spark.operators.scoring import bm25_weight_expr


def decode_runs(term_postings: DataFrame) -> DataFrame:
    """Inverse of the encode kernel: compressed runs -> posting rows
    ``(term, shard, doc_id, w)`` (Arrow kernel, vectorized decode)."""
    import numpy as np
    import pandas as pd

    from tfidf_spark.index.codec import decode_postings

    def _decode(batches):
        for pdf in batches:
            ids_all, ws_all, terms_all, shards_all = [], [], [], []
            for term, shard, pb, wb in zip(
                pdf["term"], pdf["shard"], pdf["postings"], pdf["weights"]
            ):
                ids, ws = decode_postings(bytes(pb), bytes(wb))
                ids_all.append(ids)
                ws_all.append(ws)
                terms_all.append(np.repeat(term, ids.size))
                shards_all.append(np.full(ids.size, shard, dtype=np.int32))
            if not ids_all:
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms_all),
                    "shard": np.concatenate(shards_all),
                    "doc_id": np.concatenate(ids_all),
                    "w": np.concatenate(ws_all),
                }
            )

    return term_postings.mapInPandas(
        _decode, "term string, shard int, doc_id long, w double"
    )


def delete_docs(index: IndexHandle, doc_ids: list[int]) -> int:
    """Tombstone deletes (the reference's cascade delete,
    app/db/models.py:89-91, done lakehouse-style): append doc_ids to
    ``tombstones/`` under the index. O(|delete|) — no run is touched;
    queries anti-filter tombstones (bm25_query_index over-fetches by the
    tombstone count so top-k never under-fills); ``compact_deletes``
    applies them physically. Returns the new tombstone total."""
    spark = index.spark
    spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long").write.mode(
        "append"
    ).parquet(f"{index.path}/tombstones")
    index.invalidate_tombstones()
    return index.n_tombstones


def full_compact(index: IndexHandle, out_dir: str) -> dict:
    """MAJOR compaction: decode the union of all segments, drop
    tombstoned docs (if any), re-encode into a fresh SINGLE-SEGMENT
    snapshot at ``out_dir``. This is the only path that rewrites the
    whole index — run it when ``manifest['increments']`` (segment count)
    or the tombstone fraction justifies O(index) I/O; day-to-day merges
    go through the O(delta) ``compact_index``. avgdl stays pinned; N and
    per-term df are corrected."""
    spark = index.spark
    ts = index.tombstones
    rows = decode_runs(index.term_postings)
    kept_stats = index.doc_stats
    if ts is not None:
        rows = rows.join(ts, "doc_id", "left_anti")
        kept_stats = kept_stats.join(ts, "doc_id", "left_anti")
    (
        rows.repartition("term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(_encode_sorted_stream, INDEX_SCHEMA)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_postings")
    )
    kept_stats.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")
    kept = spark.read.parquet(f"{out_dir}/doc_stats").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum")
    ).collect()[0]
    n_docs = int(kept["n"])

    tp = spark.read.parquet(f"{out_dir}/term_postings")
    tp.groupBy("term").agg(
        F.sum("df_shard").alias("df"),
        F.sum("n_bytes").alias("bytes"),
    ).write.mode("overwrite").parquet(f"{out_dir}/term_stats")

    dl_sum = float(kept["dl_sum"] or 0.0)
    snap_stats = tp.agg(
        F.sum("n_bytes").alias("b"), F.sum("df_shard").alias("p")
    ).collect()[0]
    manifest = dict(index.manifest)
    # The output is a fresh single-segment snapshot: counters that
    # describe the INCREMENT CHAIN must reset or the signals they feed
    # (increment-count compaction scheduling, avgdl-drift rebuild guard)
    # stay inflated after the compaction that was supposed to clear them.
    manifest.pop("avgdl_drift", None)
    manifest.pop("true_avgdl", None)
    manifest.update(
        {
            "format_version": FORMAT_VERSION,
            "n_docs": n_docs,
            # deletes change the true token total: recompute so later
            # increments' drift accounting stays exact
            "dl_sum": dl_sum,
            "increments": 0,
            "true_avgdl": dl_sum / max(n_docs, 1),
            "avgdl_drift": abs(dl_sum / max(n_docs, 1) - index.avgdl)
            / max(index.avgdl, 1e-12),
            "tombstones_compacted": index.n_tombstones,
            "segments": {
                # self-contained snapshot: relative names, relocatable
                "term_postings": ["term_postings"],
                "doc_stats": ["doc_stats"],
            },
            # metrics describe THIS snapshot, not the pre-compaction chain
            "metrics": {
                "docs_tokenized": 0,
                "postings_emitted": int(snap_stats["p"] or 0),
                "bytes_written_postings": int(snap_stats["b"] or 0),
                "carried_segments": 0,
            },
        }
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def compact_deletes(index: IndexHandle, out_dir: str) -> dict:
    """Physically rewrite the index without tombstoned docs — a
    ``full_compact`` that requires tombstones to exist (guarding against
    accidentally paying O(index) for a no-op)."""
    if index.tombstones is None:
        raise ValueError("no tombstones to compact")
    return full_compact(index, out_dir)


def compact_index(
    index: IndexHandle,
    new_docs: DataFrame,
    out_dir: str,
    text_col: str = "content",
    id_col: str = "doc_id",
    code_aware: bool | None = None,
    rebuild_threshold: float = 0.10,
    force: bool = False,
) -> dict:
    """Merge ``new_docs`` into ``index``, writing a NEW snapshot manifest
    at ``out_dir`` (immutable snapshots — the old index stays queryable
    during the merge, Iceberg-style).

    O(delta) by construction — ONE tokenize pass over the delta only:
      1. tokenize delta -> delta postings with weights under the PINNED
         base avgdl
      2. encode the delta postings into ``out_dir/term_postings`` — a new
         SEGMENT (same sort + stream kernel as the full build)
      3. carry every base segment over BY REFERENCE: the new manifest's
         ``segments`` lists the base's directories plus the delta's; no
         base byte is read or written
      4. re-aggregate term_stats (old stats ∪ delta stats — O(vocab),
         posting blobs untouched) and write the manifest

    ``code_aware`` defaults to the BASE index's tokenizer mode; passing a
    different mode explicitly raises — mixing tokenizers in one index
    silently corrupts postings. Existing tombstones are copied into the
    new snapshot so deleted docs stay filtered after the merge.
    """
    spark = new_docs.sparkSession
    base_mode = bool(index.manifest.get("code_aware", False))
    if code_aware is None:
        code_aware = base_mode
    elif bool(code_aware) != base_mode:
        raise ValueError(
            f"code_aware={code_aware} conflicts with the base index's "
            f"tokenizer mode ({base_mode}); an index must use ONE tokenizer"
        )
    n_shards = index.manifest["n_shards"]
    k1, b = index.k1, index.b
    pinned_avgdl = index.avgdl if index.avgdl > 0 else 1.0

    counted = with_term_counts(new_docs, text_col, code_aware)
    delta = counted.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer("term_counts").alias("term", "cnt"),
        F.col("dl"),
    )
    delta.cache()
    delta_stats = delta.groupBy("doc_id").agg(
        F.max("dl").alias("dl"), F.count("term").alias("n_unique")
    )
    n_new = delta_stats.count()
    new_dl_sum = delta_stats.agg(F.sum("dl")).collect()[0][0] or 0

    # Re-ingest guard (the reference rejects duplicate uploads by hash,
    # app/controllers/document.py:150-156): a doc_id already in the base
    # would double its stats and postings — and would break the
    # disjoint-segments invariant the multi-run query kernel relies on.
    # Deduplicate upstream (left_anti on doc_id or content sha) before
    # compacting.
    overlap = delta_stats.join(index.doc_stats, "doc_id", "left_semi").count()
    if overlap:
        raise ValueError(
            f"{overlap} delta doc_ids already exist in the base index; "
            "dedup the delta (left_anti on doc_id) before compact_index"
        )

    n_docs = index.n_docs + n_new
    # exact cumulative accounting: the base's TRUE dl_sum, not
    # pinned_avgdl * n_docs — chained increments each pin avgdl, so the
    # pinned-mean approximation would systematically shrink measured
    # drift as n_docs grows and the rebuild guard would never fire
    base_dl_sum = float(
        index.manifest.get(
            "dl_sum",
            index.manifest.get("true_avgdl", index.avgdl) * index.n_docs,
        )
    )
    true_avgdl = (base_dl_sum + float(new_dl_sum)) / max(n_docs, 1)
    drift = abs(true_avgdl - pinned_avgdl) / max(pinned_avgdl, 1e-12)
    if drift > rebuild_threshold and not force:
        raise RuntimeError(
            f"avgdl drift {drift:.3f} exceeds rebuild threshold "
            f"{rebuild_threshold}: schedule a full rebuild (or force=True)"
        )

    delta_posts = (
        delta.filter(F.col("term").isNotNull())
        .withColumn("w", bm25_weight_expr("cnt", "dl", pinned_avgdl, k1, b))
        .withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"))
        .select("term", "shard", "doc_id", "w")
    )
    (
        delta_posts.repartition("term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(_encode_sorted_stream, INDEX_SCHEMA)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_postings")
    )
    delta_stats.write.mode("overwrite").parquet(f"{out_dir}/doc_stats")

    # term_stats must stay one-row-per-term (the query-side idf join
    # broadcasts it), so it is re-aggregated: base stats ∪ the delta
    # segment's per-term sums. O(vocabulary) rows; n_bytes/df_shard are
    # stored int columns, so neither scan touches a posting blob.
    seg = spark.read.parquet(f"{out_dir}/term_postings")
    delta_ts = seg.groupBy("term").agg(
        F.sum("df_shard").alias("df"), F.sum("n_bytes").alias("bytes")
    )
    merged_ts = (
        index.term_stats.unionByName(delta_ts)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("bytes").alias("bytes"))
    )
    merged_ts.write.mode("overwrite").parquet(f"{out_dir}/term_stats")

    # carry tombstones forward: the merged snapshot must keep filtering
    # docs deleted from the base, or they silently reappear in results.
    n_carried = index.n_tombstones
    if n_carried:
        index.tombstones.write.mode("overwrite").parquet(f"{out_dir}/tombstones")

    delta_bytes = (
        seg.agg(
            F.sum("n_bytes").alias("b"), F.sum("df_shard").alias("p")
        ).collect()[0]
    )
    # Carried base segments are stored RELATIVE TO THIS SNAPSHOT's
    # directory (e.g. "../base/term_postings"): a chain of snapshots under
    # a common root can then be moved/renamed as a unit and every link
    # keeps resolving. abspath first, because segment_paths() output is
    # cwd-relative when the base index was opened via a relative path —
    # writing that verbatim would re-resolve against the NEW snapshot's
    # directory and break (ADVICE r3).
    out_abs = os.path.abspath(out_dir)
    base_segs = {
        name: [
            os.path.relpath(os.path.abspath(p), out_abs)
            for p in index.segment_paths(name)
        ]
        for name in ("term_postings", "doc_stats")
    }
    manifest = dict(index.manifest)
    manifest.update(
        {
            "format_version": FORMAT_VERSION,
            "n_docs": n_docs,
            "avgdl": pinned_avgdl,
            "true_avgdl": true_avgdl,
            "dl_sum": base_dl_sum + float(new_dl_sum),
            "avgdl_drift": drift,
            "increments": index.manifest.get("increments", 0) + 1,
            "segments": {
                # every entry is relative to this snapshot's directory:
                # "term_postings" is the delta segment inside it, the
                # "../..."-style entries are the carried base segments.
                # Move the common root as a unit and the chain survives;
                # full_compact still self-contains when you want a
                # snapshot with no external references at all.
                "term_postings": base_segs["term_postings"]
                + ["term_postings"],
                "doc_stats": base_segs["doc_stats"] + ["doc_stats"],
            },
            "metrics": {
                "docs_tokenized": n_new,
                # O(delta) evidence: posting bytes WRITTEN by this merge —
                # the delta segment only; carried segments contribute 0.
                "postings_emitted": int(delta_bytes["p"] or 0),
                "bytes_written_postings": int(delta_bytes["b"] or 0),
                "carried_segments": len(base_segs["term_postings"]),
            },
        }
    )
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    delta.unpersist()
    return manifest
