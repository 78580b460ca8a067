"""Corpus source abstraction: parquet paths now, Iceberg tables when a
catalog is configured.

The engine targets an Iceberg table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). Two Iceberg paths exist:

- a real ``iceberg-spark-runtime`` jar on the classpath -> the DSv2
  reader/writer (catalog table names, engine-side split planning);
- no jar (this sandbox: no network, fetch attempt recorded in
  FIXTURES.md) -> the pure-Python table-format implementation in
  ``sources/iceberg_meta.py`` resolves version-hint -> metadata.json ->
  snapshot -> manifest list -> manifests -> live parquet files per the
  public spec, and Spark scans those files directly. Snapshot pinning
  and resume fingerprints behave identically on both paths.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an iceberg-spark-runtime jar is actually loadable.

    NOTE: ``spark._jvm.org.apache.iceberg.Table`` is NOT a valid probe —
    py4j resolves unknown dotted names to lazy JavaPackage objects and
    never raises. Ask the driver's context classloader (which includes
    --jars / spark.jars.packages) to load the class for real."""
    try:
        loader = spark._jvm.java.lang.Thread.currentThread().getContextClassLoader()
        loader.loadClass("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


_FILE_COL, _POS_COL, _DSEQ_COL = "__iceberg_file", "__iceberg_pos", "__iceberg_dseq"


# Above this many delete rows the merge-on-read anti-joins switch from
# broadcast to shuffle joins: delete files are usually metadata-sized,
# but delete_where is explicitly built to commit billions of positions
# distributed — broadcasting those would blow the driver/executor memory
# on the NEXT read of the table. Threshold is rows (the delete frames
# are narrow: (path, pos) or the equality key columns).
_BROADCAST_DELETE_ROWS = int(
    os.environ.get("TFIDF_ICEBERG_BROADCAST_DELETE_ROWS", "4000000")
)


def _maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    if n_rows <= _BROADCAST_DELETE_ROWS:
        return F.broadcast(df)
    # large delete set: let the optimizer plan a shuffle join (a
    # compact_table run would fold these back into data files)
    return df


# Iceberg primitive -> Spark cast target (for typed NULLs of columns
# added after a file was written). Iceberg `timestamp` is the TZ-free
# flavor in this writer (see iceberg_meta._SPARK_TO_ICEBERG).
_ICEBERG_TO_SPARK = {
    "string": "string",
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp_ntz",
}


def _rename_map(writer_names: dict, current_names: dict) -> dict[str, str]:
    """Field-id join of a file's WRITER schema against the table's
    current schema -> {old_column_name: current_name} for every field
    whose label changed (ids are the identity; names are labels)."""
    return {
        writer_names[fid]: current_names[fid]
        for fid in writer_names
        if fid in current_names and writer_names[fid] != current_names[fid]
    }


def _scan_entries(
    spark: SparkSession,
    data_dir: str,
    ent: dict,
    entries: list[dict],
    with_meta: bool = False,
) -> DataFrame:
    """Scan data-file entries presenting the CURRENT schema's column
    names: files are grouped by the schema they were written under
    (``snapshot_entries`` resolves it per entry through the adding
    snapshot), renamed via the field-id mapping, and PROJECTED onto the
    current schema — so a table that had ``ALTER TABLE RENAME/ADD/DROP
    COLUMN`` run between snapshots reads all its files consistently
    instead of silently mis-binding by name: renamed columns bind by
    field id, columns added after a file was written surface as typed
    NULLs in that file, dropped columns vanish from reads while
    remaining physically in old files. One scan per distinct writer
    schema (almost always exactly one), unioned by name. Transform-
    derived hive columns (``repo_bucket``) are layout-only, outside the
    schema, and disappear in the projection."""
    cur = ent["schemas_by_id"].get(ent["current_schema_id"], {})
    cur_fields = ent.get("current_schema_fields")
    groups: dict[int, list[str]] = {}
    for d in entries:
        groups.setdefault(d.get("schema_id", ent["current_schema_id"]), []).append(
            d["path"]
        )
    parts = []
    for sid in sorted(groups):
        s = spark.read.option("basePath", data_dir).parquet(*groups[sid])
        if with_meta:
            # _metadata resolves only on the scan relation — capture it
            # before any projection
            s = s.withColumns(
                {
                    _FILE_COL: F.col("_metadata.file_path"),
                    _POS_COL: F.col("_metadata.row_index"),
                }
            )
        ren = _rename_map(ent["schemas_by_id"].get(sid, cur), cur)
        if ren:
            s = s.withColumnsRenamed(ren)
        if cur_fields is not None:
            have = set(s.columns)
            cols = [
                F.col(f["name"])
                if f["name"] in have
                else F.lit(None).cast(_ICEBERG_TO_SPARK[f["type"]]).alias(f["name"])
                for f in cur_fields
            ]
            cols += [F.col(c) for c in (_FILE_COL, _POS_COL) if c in have]
            s = s.select(*cols)
        parts.append(s)
    return reduce(DataFrame.unionByName, parts)


def _read_eq_keys(spark: SparkSession, ent: dict, e: dict) -> DataFrame:
    """Equality-delete key file -> DataFrame of its key columns under
    CURRENT names (the delete parquet was written under the schema of
    its committing snapshot)."""
    cur = ent["schemas_by_id"].get(ent["current_schema_id"], {})
    writer = ent["schemas_by_id"].get(e.get("schema_id"), cur)
    d = spark.read.parquet(e["path"])
    ren = _rename_map(writer, cur)
    if ren:
        d = d.withColumnsRenamed(ren)
    return d.select(*e["equality_cols"])


def _exact_partition_row_filter(
    df: DataFrame, ent: dict, partition_filter: dict | None
) -> DataFrame:
    """Partition pruning through a TRANSFORMED spec (bucket/truncate/
    time) is a superset — the bucket holds every value hashing to it. A
    filter keyed by a SOURCE column is therefore also applied as an
    exact row predicate (typed, pushed down to the parquet scan), so
    ``read_table(partition_filter={"repo": "x"})`` returns exactly
    repo x on ANY spec. Filters keyed by a derived field name
    (``repo_bucket``) stay layout-level by design."""
    if not partition_filter:
        return df
    from tfidf_spark.sources.iceberg_meta import _coerce

    types = {
        pf["source_name"]: pf["source_type"] for pf in ent["partition_fields"]
    }
    for col, vals in partition_filter.items():
        if col in types and col in df.columns:
            if not isinstance(vals, (list, tuple, set, frozenset)):
                vals = [vals]
            df = df.filter(
                F.col(col).isin([_coerce(v, types[col]) for v in vals])
            )
    return df


def _drop_derived_partition_cols(df: DataFrame, pfields: list[dict]) -> DataFrame:
    """Spark's basePath partition discovery reconstructs EVERY hive dir
    as a column — for identity fields that is the round-trip we want
    (partitionBy dropped the source column from the files), but for
    transformed fields (``repo_bucket=3``) the derived column is layout
    metadata, not table schema: the source column is stored in the data
    files, so drop the derived one."""
    derived = [pf["name"] for pf in pfields if pf.get("transform") != "identity"]
    return df.drop(*derived) if derived else df


def read_table(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    range_filter: dict | None = None,
    _with_position: bool = False,
) -> tuple[DataFrame, int]:
    """Read a pure-Python-format Iceberg table -> (df, resolved snapshot
    id), with the full spec read path:

    - **partition pruning**: ``partition_filter`` ({source_col:
      value-or-list}) is coerced to the source type, pushed through the
      spec's transforms (identity, bucket, truncate, time) and prunes
      manifests via their field summaries and files via their partition
      tuples BEFORE Spark ever lists them. Because transformed pruning
      is a superset (a bucket holds every value hashing to it), the same
      filter is also applied as an exact typed row predicate on source
      columns — the result is exact on ANY spec. Hive layout +
      ``basePath`` reconstructs identity partition columns; derived
      transform columns are layout-only and dropped.
    - **zone-map pruning**: ``range_filter`` ({col: (lo, hi)},
      inclusive, None = open) skips whole files via the manifests'
      per-column value bounds (spec fields 125/128, written from
      parquet footer stats at commit), then applies the same ranges as
      exact row predicates. Most effective on ``write_table(...,
      sort_by=[col])`` tables, whose files carry tight disjoint bounds.
    - **merge-on-read deletes**: position-delete files are applied by
      anti-joining ``(_metadata.file_path, _metadata.row_index)`` —
      Spark's per-file row position, exactly the spec's ``pos`` — scoped
      to data files with data_seq <= delete_seq; equality-delete files
      anti-join their key columns scoped to data_seq < delete_seq. Delete
      sides are broadcast while their manifest-recorded row counts stay
      under ``TFIDF_ICEBERG_BROADCAST_DELETE_ROWS`` (no extra shuffle on
      the scan); a mass-delete snapshot past the threshold falls back to
      a shuffle join instead of OOMing the driver.
    """
    from tfidf_spark.sources import iceberg_meta

    ent = iceberg_meta.snapshot_entries(
        table_dir, snapshot_id=snapshot_id, partition_filter=partition_filter,
        spark=spark, range_filter=range_filter,
    )
    if not ent["data"]:
        raise ValueError(
            f"Iceberg snapshot {ent['snapshot_id']} lists no data files"
            + (f" for partition filter {partition_filter}" if partition_filter else "")
        )
    data_dir = os.path.join(os.path.abspath(table_dir), "data")
    pos, eq = ent["pos_deletes"], ent["eq_deletes"]
    with_meta = bool(pos or eq or _with_position)
    df = _exact_partition_row_filter(
        _drop_derived_partition_cols(
            _scan_entries(spark, data_dir, ent, ent["data"], with_meta=with_meta),
            ent["partition_fields"],
        ),
        ent,
        partition_filter,
    )
    # zone-map pruning skips whole files; the same ranges are applied as
    # row predicates (pushed to the parquet scan) for exact results
    for col, (lo, hi) in (range_filter or {}).items():
        if col in df.columns:
            if lo is not None:
                df = df.filter(F.col(col) >= lo)
            if hi is not None:
                df = df.filter(F.col(col) <= hi)
    if not pos and not eq:
        return df, ent["snapshot_id"]
    # per-file data sequence numbers (metadata-sized -> broadcast);
    # _metadata.file_path is a Hadoop-style "file:/abs/path" URI (single
    # slash, no authority), manifest paths are absolute
    seq_map = spark.createDataFrame(
        [(f"file:{d['path']}", d["seq"]) for d in ent["data"]],
        f"{_FILE_COL} string, {_DSEQ_COL} long",
    )
    df = df.join(F.broadcast(seq_map), _FILE_COL, "left")

    if pos:
        dels = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(p["path"]).withColumn(
                    "_delseq", F.lit(p["seq"]).cast("long")
                )
                for p in pos
            ],
        ).select(
            F.concat(F.lit("file:"), F.col("file_path")).alias("_dfile"),
            F.col("pos").alias("_dpos"),
            "_delseq",
        )
        df = df.join(
            _maybe_broadcast(dels, sum(p["record_count"] for p in pos)),
            (F.col(_FILE_COL) == F.col("_dfile"))
            & (F.col(_POS_COL) == F.col("_dpos"))
            & (F.col(_DSEQ_COL) <= F.col("_delseq")),
            "left_anti",
        )
    for e in eq:
        if not e["equality_cols"]:
            raise ValueError(f"equality delete file {e['path']} has no equality_ids")
        d = _read_eq_keys(spark, ent, e).withColumn(
            "_delseq", F.lit(e["seq"]).cast("long")
        )
        cond = reduce(
            lambda a, b: a & b,
            [df[c].eqNullSafe(d[c]) for c in e["equality_cols"]],
        ) & (df[_DSEQ_COL] < d["_delseq"])
        df = df.join(_maybe_broadcast(d, e["record_count"]), cond, "left_anti")
    df = df.drop(_DSEQ_COL)
    if not _with_position:
        df = df.drop(_FILE_COL, _POS_COL)
    return df, ent["snapshot_id"]


def delete_where(
    spark: SparkSession,
    table_dir: str,
    condition,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Engine-style merge-on-read DELETE: find the (file, position) of
    every CURRENTLY-LIVE row matching ``condition`` (string or Column)
    and commit them as a position-delete snapshot — no data file is
    rewritten (O(matched rows) I/O, like the index's tombstones).

    Fully distributed: the matched positions are written straight to
    parquet delete files by the executors (range-partitioned by
    file_path, sorted (file_path, pos) within each file per the spec's
    delete-file ordering) — nothing is collected to the driver, so a
    DELETE touching billions of rows at 100 TB stays a shuffle-write, not
    a driver OOM. Returns the new snapshot id; a no-match condition
    commits nothing and returns the current snapshot id."""
    import glob as _glob
    import shutil

    from tfidf_spark.sources import iceberg_meta

    df, resolved = read_table(spark, table_dir, _with_position=True)
    hits = df.filter(condition).select(
        F.expr(f"substring({_FILE_COL}, 6)").alias("file_path"),
        F.col(_POS_COL).alias("pos"),
    )
    staging = os.path.join(table_dir, "_delete_staging")
    (
        hits.repartitionByRange(max(1, hits.rdd.getNumPartitions() // 8), "file_path")
        .sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite")
        .parquet(staging)
    )
    import pyarrow.parquet as pq

    parts = sorted(_glob.glob(os.path.join(staging, "*.parquet")))
    moved = []
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    for p in parts:
        if pq.ParquetFile(p).metadata.num_rows == 0:
            continue
        import hashlib

        dst = os.path.join(
            data_dir,
            "pd-" + hashlib.sha256(p.encode()).hexdigest()[:16] + ".parquet",
        )
        shutil.move(p, dst)
        moved.append(dst)
    shutil.rmtree(staging)
    if not moved:
        return resolved
    return iceberg_meta.commit_position_delete_files(
        table_dir, moved, timestamp_ms=timestamp_ms
    )


def incremental_changes(
    spark: SparkSession,
    table_dir: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    scan_eq_deletes: bool = False,
) -> tuple[DataFrame, DataFrame | None, int]:
    """Metadata-driven CDC between two snapshots of a pure-Python-format
    Iceberg table -> ``(appended_df, deleted_df_or_None, resolved_to_id)``.

    - **appended**: rows of data files present at ``to`` but not at
      ``from`` — a FILE-LEVEL diff from the manifests, so the old
      snapshot is never scanned (the r4 lifecycle anti-joined the two
      live views, an O(table) job; this is O(delta)). Merge-on-read
      deletes already committed against those new files are applied.
    - **deleted**: rows POSITION-deleted between the snapshots, read by
      joining the new delete files' ``(file_path, pos)`` against only
      the data files they name — O(affected files), not O(table).
      Equality deletes committed in the window raise by default:
      extracting their row images requires scanning every older live
      file. Pass ``scan_eq_deletes=True`` to accept that documented
      O(old-files) cost — the ``from`` snapshot's live view is scanned
      once and semi-joined against the new equality-delete keys (every
      ``from``-live file has data_seq <= seq(from) < delete_seq, so the
      spec's sequence scoping is implied), and the same keys are
      anti-joined out of ``appended`` for files written before the
      delete (net CDC semantics, like the position path).

    This is the table-side feed for index maintenance: appended rows ->
    ``incremental.compact_index`` (O(delta) segment merge), deleted rows
    -> ``incremental.delete_docs`` tombstones. Together with snapshot-id
    resume fingerprints this closes the north-rule loop: pin -> build ->
    table changes -> incremental index update, no full rebuild."""
    from tfidf_spark.sources import iceberg_meta

    ent_from = iceberg_meta.snapshot_entries(
        table_dir, snapshot_id=from_snapshot_id, spark=spark
    )
    ent_to = iceberg_meta.snapshot_entries(
        table_dir, snapshot_id=to_snapshot_id, spark=spark
    )
    data_dir = os.path.join(os.path.abspath(table_dir), "data")

    # a REPLACE commit (rewrite_table / compact_table) inside the window
    # breaks the file-set diff: every rewritten file would look "new"
    # (the whole table re-emitted as appends) and rows the rewrite
    # dropped would report no deletes — silent downstream corruption, so
    # refuse loudly like the in-window equality-delete case below
    meta = iceberg_meta.current_metadata(table_dir)
    snaps = meta.get("snapshots", [])
    ids = [s["snapshot-id"] for s in snaps]
    try:
        i_from, i_to = ids.index(ent_from["snapshot_id"]), ids.index(ent_to["snapshot_id"])
    except ValueError as e:
        raise ValueError(f"snapshot not in table history: {e}") from None
    for s in snaps[i_from + 1: i_to + 1]:
        summary = s.get("summary") or {}
        op = summary.get("operation")
        if summary.get("rewrite-manifests") == "true":
            # manifest merge (rewrite_manifests): metadata-only, the data
            # file set is unchanged, so the file-level diff is untouched
            continue
        if op in ("replace", "overwrite"):
            raise NotImplementedError(
                f"snapshot {s['snapshot-id']} in the CDC window is a "
                f"{op!r} commit (rewrite/compaction): a file-level diff "
                "cannot attribute its row-level changes — resume CDC from "
                "the post-rewrite snapshot, or diff the two live views "
                "explicitly if the O(table) cost is intended"
            )

    old_files = {d["path"] for d in ent_from["data"]}
    new_entries = [d for d in ent_to["data"] if d["path"] not in old_files]
    old_pos = {p["path"] for p in ent_from["pos_deletes"]}
    old_eq = {e["path"] for e in ent_from["eq_deletes"]}
    new_pos = [p for p in ent_to["pos_deletes"] if p["path"] not in old_pos]
    new_eq = [e for e in ent_to["eq_deletes"] if e["path"] not in old_eq]
    if new_eq and not scan_eq_deletes:
        raise NotImplementedError(
            "equality deletes were committed between the snapshots; their "
            "row images require scanning all older live files — pass "
            "scan_eq_deletes=True to accept that O(old-files) cost"
        )

    if new_entries:
        appended = _drop_derived_partition_cols(
            _scan_entries(
                spark, data_dir, ent_to, new_entries,
                with_meta=bool(new_pos or new_eq),
            ),
            ent_to["partition_fields"],
        )
        if new_pos:
            dels = reduce(
                DataFrame.unionByName,
                [spark.read.parquet(p["path"]) for p in new_pos],
            ).select(
                F.concat(F.lit("file:"), F.col("file_path")).alias(_FILE_COL),
                F.col("pos").alias(_POS_COL),
            )
            appended = appended.join(
                _maybe_broadcast(dels, sum(p["record_count"] for p in new_pos)),
                [_FILE_COL, _POS_COL],
                "left_anti",
            )
        if new_eq:
            # per-file data sequence numbers for the new files, so an
            # equality delete only erases appended rows WRITTEN BEFORE it
            # (data_seq < delete_seq, the spec's scoping rule)
            seq_map = spark.createDataFrame(
                [(f"file:{d['path']}", d["seq"]) for d in new_entries],
                f"{_FILE_COL} string, {_DSEQ_COL} long",
            )
            appended = appended.join(F.broadcast(seq_map), _FILE_COL, "left")
            for e in new_eq:
                d = _read_eq_keys(spark, ent_to, e).withColumn(
                    "_delseq", F.lit(e["seq"]).cast("long")
                )
                cond = reduce(
                    lambda a, b: a & b,
                    [appended[c].eqNullSafe(d[c]) for c in e["equality_cols"]],
                ) & (appended[_DSEQ_COL] < d["_delseq"])
                appended = appended.join(
                    _maybe_broadcast(d, e["record_count"]), cond, "left_anti"
                )
            appended = appended.drop(_DSEQ_COL)
        if new_pos or new_eq:
            appended = appended.drop(_FILE_COL, _POS_COL)
    else:
        df_any, _ = read_table(spark, table_dir, snapshot_id=to_snapshot_id)
        appended = df_any.limit(0)

    deleted = None
    if new_pos:
        dels = reduce(
            DataFrame.unionByName,
            [spark.read.parquet(p["path"]) for p in new_pos],
        )
        # only data files the delete files actually name are opened; the
        # deleted ROW IMAGES come from joining on the file's row position
        affected = sorted(
            {r["file_path"] for r in dels.select("file_path").distinct().collect()}
            & old_files
        )
        if affected:
            aff_set = set(affected)
            old_rows = _drop_derived_partition_cols(
                _scan_entries(
                    spark, data_dir, ent_from,
                    [d for d in ent_from["data"] if d["path"] in aff_set],
                    with_meta=True,
                ),
                ent_from["partition_fields"],
            )
            keys = dels.select(
                F.concat(F.lit("file:"), F.col("file_path")).alias(_FILE_COL),
                F.col("pos").alias(_POS_COL),
            )
            deleted = old_rows.join(
                _maybe_broadcast(keys, sum(p["record_count"] for p in new_pos)),
                [_FILE_COL, _POS_COL],
                "left_semi",
            )
    if new_eq:
        # the documented O(old-files) path: every from-live row matching
        # a new equality-delete key is dead at `to` (sequence scoping is
        # implied — see docstring); semi-join the from snapshot's live
        # view once per delete file
        from_view, _ = read_table(
            spark, table_dir, snapshot_id=ent_from["snapshot_id"],
            _with_position=True,
        )
        eq_dead = None
        for e in new_eq:
            d = _read_eq_keys(spark, ent_to, e)
            cond = reduce(
                lambda a, b: a & b,
                [from_view[c].eqNullSafe(d[c]) for c in e["equality_cols"]],
            )
            hit = from_view.join(
                _maybe_broadcast(d, e["record_count"]), cond, "left_semi"
            )
            eq_dead = hit if eq_dead is None else eq_dead.unionByName(hit)
        # a row can be both position- and equality-deleted in the window
        # — emit one delete event per row image
        deleted = (
            eq_dead if deleted is None else deleted.unionByName(eq_dead)
        ).dropDuplicates([_FILE_COL, _POS_COL])
    if deleted is not None:
        deleted = deleted.drop(_FILE_COL, _POS_COL)

    return appended, deleted, ent_to["snapshot_id"]


def compact_table(
    spark: SparkSession,
    table_dir: str,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Copy-on-write compaction: materialize the CURRENT live view (all
    merge-on-read deletes applied) as a REPLACE snapshot, after which the
    live read path carries no delete files at all (``live_data_files``
    works again; per-row anti-joins disappear from the scan plan). Old
    snapshots stay time-travelable until ``expire_snapshots`` reclaims
    their files. Run it when the delete-file count or deleted-row
    fraction justifies the rewrite — the table-level twin of the index's
    ``full_compact`` vs ``patch_deletes`` tradeoff."""
    from tfidf_spark.sources import iceberg_meta

    df, _ = read_table(spark, table_dir)
    return iceberg_meta.rewrite_table(df, table_dir, timestamp_ms=timestamp_ms)


def load_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> tuple[DataFrame, str]:
    """Load the corpus; returns (df, fingerprint).

    fmt: 'parquet' | 'iceberg' | 'jsonl' | 'csv' | 'orc' | 'auto'
    (iceberg when `source` has no path separator and a catalog resolves
    it). The fingerprint feeds
    build_index(source_snapshot=...): Iceberg's snapshot id when pinned,
    else the source string (parquet dirs are assumed immutable-per-path —
    version the path, as every lakehouse layout does).
    """
    from tfidf_spark.sources import iceberg_meta

    if fmt == "auto":
        if "/" not in source and iceberg_available(spark):
            fmt = "iceberg"
        elif iceberg_meta.is_iceberg_table(source):
            fmt = "iceberg"
        else:
            fmt = "parquet"
    if fmt == "iceberg":
        if not iceberg_meta.is_iceberg_table(source):
            # not a filesystem table dir: a catalog table name, which
            # only the DSv2 reader (runtime jar) can resolve
            if not iceberg_available(spark):
                raise RuntimeError(
                    f"{source!r} is not a filesystem Iceberg table "
                    "(no metadata/ tree) and no iceberg-spark-runtime jar "
                    "is on the session classpath to resolve it as a "
                    "catalog name (pass --jars / spark.jars.packages "
                    "org.apache.iceberg:iceberg-spark-runtime-*)."
                )
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            df = reader.load(source)
            fp = (
                f"iceberg:{source}@"
                f"{snapshot_id if snapshot_id is not None else 'current'}"
            )
            return df, fp
        # pure-Python table-format path (sources/iceberg_meta.py): walk the
        # spec's metadata tree to the snapshot's live parquet files and
        # scan those directly — pushdown/pruning intact per file, identity
        # partition pruning applied BEFORE listing, merge-on-read deletes
        # applied via broadcast anti-joins (read_table). The fingerprint is
        # the RESOLVED snapshot id, so "current" that moved between runs
        # changes the resume fingerprint, exactly as the checkpoint
        # contract needs.
        df, resolved = read_table(
            spark,
            source,
            snapshot_id=snapshot_id,
            partition_filter=partition_filter,
        )
        fp = f"iceberg:{source}@{resolved}"
        if partition_filter:
            fp += f"?{sorted(partition_filter.items())!r}"
        return df, fp
    if partition_filter:
        raise ValueError("partition_filter requires an Iceberg source")
    if fmt == "parquet":
        return spark.read.parquet(source), f"parquet:{source}"
    # raw-dump ingestion formats a training-data pipeline meets before
    # anything is table-formatted. All three scan distributed with
    # column pruning; predicate pushdown applies to ORC (columnar), while
    # JSONL/CSV are row formats whose scan cost is the parse itself —
    # land them in parquet/Iceberg once, then index from that.
    if fmt == "jsonl":
        # newline-delimited JSON, the common crawl/dump interchange form
        return spark.read.json(source), f"jsonl:{source}"
    if fmt == "csv":
        return (
            spark.read.options(header=True, inferSchema=True,
                               escape='"', multiLine=True).csv(source),
            f"csv:{source}",
        )
    if fmt == "orc":
        return spark.read.orc(source), f"orc:{source}"
    raise ValueError(f"unknown corpus format {fmt!r}")


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """Overwrite write for parquet; for Iceberg, a DSv2 createOrReplace
    when a runtime jar is present, else an append snapshot through the
    pure-Python metadata writer (sources/iceberg_meta.py). ``partition_by``
    creates an identity-partitioned table (hive data layout + partition
    tuples in the manifests) on first write."""
    if fmt == "iceberg":
        if iceberg_available(df.sparkSession):
            w = df.writeTo(target)
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            from tfidf_spark.sources import iceberg_meta

            iceberg_meta.write_table(df, target, partition_by=partition_by)
    else:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
