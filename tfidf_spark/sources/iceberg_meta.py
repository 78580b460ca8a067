"""Apache Iceberg table-format metadata layer — pure Python, from the
PUBLIC spec (https://iceberg.apache.org/spec/, format-version 2).

The north-rule input is "an Iceberg table of source-code repositories".
No ``iceberg-spark-runtime`` jar can exist in this sandbox (no network —
the fetch attempt is recorded in FIXTURES.md), so instead of mocking,
this module implements the TABLE FORMAT itself: an Iceberg table is just
parquet data files plus a metadata tree —

    table/
      metadata/
        version-hint.text            latest metadata version number
        v<N>.metadata.json           table metadata: schemas, snapshots
        snap-<id>.avro               manifest list (one per snapshot)
        m-<uuid>.avro                manifests (data-file entry lists)
      data/
        *.parquet

Reading walks  version-hint -> metadata.json -> snapshot (current or
pinned by id) -> manifest list -> manifests -> live data files
(status != DELETED, content == DATA), exactly the resolution the spec
prescribes; Spark then scans those parquet files directly, which keeps
predicate pushdown and column pruning intact (each file is a normal
parquet scan). v1 and v2 metadata both parse; delete manifests
(merge-on-read) raise — this writer never produces them.

Writing produces spec-shaped v2 metadata (manifest entries with the
spec's field names and ids, snapshot summaries, parent-snapshot lineage,
``last-sequence-number``), so fixtures created here are genuine Iceberg
metadata trees, not lookalikes. Appends reuse prior manifests BY
REFERENCE in the new manifest list — the same O(delta) commit shape real
Iceberg uses, and the model for this engine's own segment manifests.

Determinism: snapshot ids derive from content (sha256 of the manifest
file list), timestamps are caller-supplied — identical inputs produce
identical tables, which the driver's hash gates rely on.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

from tfidf_spark.sources.avro import read_container, write_container

# manifest_entry writer schema (spec "Manifests", format-version 2):
# field names and ids per the spec table; stats columns that this writer
# leaves NULL are declared optional, exactly like real minimal manifests.
_DATA_FILE_SCHEMA = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {
            "name": "partition",
            "type": {"type": "record", "name": "r102", "fields": []},
            "field-id": 102,
        },
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {
            "name": "sort_order_id",
            "type": ["null", "int"],
            "default": None,
            "field-id": 140,
        },
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {
            "name": "snapshot_id",
            "type": ["null", "long"],
            "default": None,
            "field-id": 1,
        },
        {
            "name": "sequence_number",
            "type": ["null", "long"],
            "default": None,
            "field-id": 3,
        },
        {
            "name": "file_sequence_number",
            "type": ["null", "long"],
            "default": None,
            "field-id": 4,
        },
        {"name": "data_file", "type": _DATA_FILE_SCHEMA, "field-id": 2},
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

# manifest_entry.status / data_file.content values (spec enums)
STATUS_EXISTING, STATUS_ADDED, STATUS_DELETED = 0, 1, 2
CONTENT_DATA, CONTENT_POSITION_DELETES, CONTENT_EQUALITY_DELETES = 0, 1, 2


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _strip_file_uri(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def is_iceberg_table(table_dir: str) -> bool:
    md = _meta_dir(table_dir)
    return os.path.isfile(os.path.join(md, "version-hint.text")) or bool(
        glob.glob(os.path.join(md, "v*.metadata.json"))
    )


def current_metadata(table_dir: str) -> dict:
    """Latest table metadata: version-hint if present, else the highest
    v<N>.metadata.json (the spec's file-system-catalog resolution)."""
    md = _meta_dir(table_dir)
    hint = os.path.join(md, "version-hint.text")
    if os.path.isfile(hint):
        with open(hint) as f:
            version = int(f.read().strip())
        path = os.path.join(md, f"v{version}.metadata.json")
    else:
        versions = glob.glob(os.path.join(md, "v*.metadata.json"))
        if not versions:
            raise FileNotFoundError(f"no Iceberg metadata under {md}")
        path = max(
            versions,
            key=lambda p: int(os.path.basename(p).split(".")[0][1:]),
        )
    with open(path) as f:
        return json.load(f)


def resolve_snapshot(meta: dict, snapshot_id: int | None = None) -> dict:
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    if sid in (None, -1):
        raise ValueError("table has no current snapshot")
    for snap in meta.get("snapshots", []):
        if snap["snapshot-id"] == sid:
            return snap
    raise ValueError(f"snapshot {sid} not found in table metadata")


def live_data_files(
    table_dir: str, snapshot_id: int | None = None
) -> tuple[list[str], int]:
    """-> (live parquet file paths at the snapshot, resolved snapshot id).

    Spec resolution: the snapshot's manifest list enumerates manifests;
    each manifest's entries with status != DELETED are live. Delete
    manifests (merge-on-read) raise NotImplementedError — out of scope
    for this writer, surfaced loudly rather than silently mis-read."""
    meta = current_metadata(table_dir)
    snap = resolve_snapshot(meta, snapshot_id)
    mlist_path = _strip_file_uri(snap["manifest-list"])
    _, manifests = read_container(mlist_path)
    files: list[str] = []
    for mf in manifests:
        if mf.get("content", 0) != 0:
            raise NotImplementedError(
                "delete manifests (merge-on-read) are not supported by the "
                "pure-Python Iceberg reader; compact the table first"
            )
        _, entries = read_container(_strip_file_uri(mf["manifest_path"]))
        for e in entries:
            if e["status"] == STATUS_DELETED:
                continue
            df = e["data_file"]
            if df.get("content", CONTENT_DATA) != CONTENT_DATA:
                raise NotImplementedError("delete files are not supported")
            if df["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"unsupported data file format {df['file_format']!r}"
                )
            files.append(_strip_file_uri(df["file_path"]))
    return files, snap["snapshot-id"]


def snapshot_ids(table_dir: str) -> list[int]:
    meta = current_metadata(table_dir)
    return [s["snapshot-id"] for s in meta.get("snapshots", [])]


# --------------------------------------------------------------------------
# writing
# --------------------------------------------------------------------------

_SPARK_TO_ICEBERG = {
    "string": "string",
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "binary",
}


def _iceberg_schema(spark_schema) -> dict:
    """Spark StructType -> Iceberg schema JSON (flat columns only — the
    input_hint table is flat (repo, path, commit, lang, content))."""
    fields = []
    for i, f in enumerate(spark_schema.fields, start=1):
        t = _SPARK_TO_ICEBERG.get(f.dataType.simpleString())
        if t is None:
            raise NotImplementedError(
                f"column {f.name}: type {f.dataType.simpleString()} not "
                "mapped to an Iceberg primitive"
            )
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": False,
                "type": t,
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _snapshot_id_for(files: list[str], parent: int | None) -> int:
    h = hashlib.sha256(
        ("\n".join(sorted(files)) + f"|{parent}").encode()
    ).digest()
    return int.from_bytes(h[:8], "big") & ((1 << 62) - 1)


def _write_manifest(
    md: str, files: list[str], snapshot_id: int, seq: int
) -> dict:
    entries = []
    total_rows = 0
    for p in files:
        size = os.path.getsize(p)
        entries.append(
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest
                "file_sequence_number": None,
                "data_file": {
                    "content": CONTENT_DATA,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": _parquet_row_count(p),
                    "file_size_in_bytes": size,
                    "sort_order_id": None,
                },
            }
        )
        total_rows += entries[-1]["data_file"]["record_count"]
    name = f"m-{hashlib.sha256(repr(sorted(files)).encode()).hexdigest()[:16]}.avro"
    path = os.path.join(md, name)
    write_container(
        path,
        MANIFEST_ENTRY_SCHEMA,
        entries,
        extra_meta={
            "schema": b"{}",
            "partition-spec": b"[]",
            "partition-spec-id": b"0",
            "format-version": b"2",
            "content": b"data",
        },
    )
    return {
        "manifest_path": os.path.abspath(path),
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": total_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }


def _parquet_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def commit_append(
    table_dir: str,
    new_data_files: list[str],
    spark_schema=None,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Append ``new_data_files`` as a new snapshot; creates the table on
    first commit. Returns the new snapshot id.

    The commit is the spec's append shape: one new manifest for the added
    files, prior manifests carried BY REFERENCE in the new manifest list,
    a new metadata.json with the snapshot appended (parent-snapshot-id
    chained) and version-hint bumped. Deterministic: ids derive from file
    lists, the timestamp is a parameter."""
    md = _meta_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    if is_iceberg_table(table_dir):
        meta = current_metadata(table_dir)
        version = (
            max(
                int(os.path.basename(p).split(".")[0][1:])
                for p in glob.glob(os.path.join(md, "v*.metadata.json"))
            )
            + 1
        )
    else:
        if spark_schema is None:
            raise ValueError("spark_schema is required for the first commit")
        meta = {
                "format-version": 2,
                "table-uuid": hashlib.sha256(
                    os.path.abspath(table_dir).encode()
                ).hexdigest()[:32],
                "location": os.path.abspath(table_dir),
                "last-sequence-number": 0,
                "last-updated-ms": timestamp_ms,
                "last-column-id": len(spark_schema.fields),
                "current-schema-id": 0,
                "schemas": [_iceberg_schema(spark_schema)],
                "default-spec-id": 0,
                "partition-specs": [{"spec-id": 0, "fields": []}],
                "default-sort-order-id": 0,
                "sort-orders": [{"order-id": 0, "fields": []}],
                "properties": {},
                "current-snapshot-id": -1,
                "snapshots": [],
                "snapshot-log": [],
                "metadata-log": [],
            }
        version = 1

    parent = meta.get("current-snapshot-id")
    parent = None if parent in (None, -1) else parent
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = _snapshot_id_for(new_data_files, parent)

    manifest = _write_manifest(md, new_data_files, snapshot_id, seq)
    carried = []
    if parent is not None:
        prev = resolve_snapshot(meta, parent)
        _, carried = read_container(_strip_file_uri(prev["manifest-list"]))
    manifests = carried + [manifest]

    mlist_path = os.path.join(md, f"snap-{snapshot_id}.avro")
    write_container(
        mlist_path,
        MANIFEST_FILE_SCHEMA,
        manifests,
        extra_meta={"format-version": b"2"},
    )

    added_rows = manifest["added_rows_count"]
    total_rows = sum(m["added_rows_count"] for m in manifests)
    snap = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": timestamp_ms,
        "manifest-list": os.path.abspath(mlist_path),
        "schema-id": 0,
        "summary": {
            "operation": "append",
            "added-data-files": str(manifest["added_files_count"]),
            "added-records": str(added_rows),
            "total-records": str(total_rows),
            "total-data-files": str(
                sum(m["added_files_count"] for m in manifests)
            ),
        },
    }
    if parent is not None:
        snap["parent-snapshot-id"] = parent

    meta = dict(meta)
    meta["snapshots"] = list(meta.get("snapshots", [])) + [snap]
    meta["current-snapshot-id"] = snapshot_id
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = timestamp_ms
    meta["snapshot-log"] = list(meta.get("snapshot-log", [])) + [
        {"timestamp-ms": timestamp_ms, "snapshot-id": snapshot_id}
    ]

    with open(os.path.join(md, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(version))
    return snapshot_id


def write_table(
    df,
    table_dir: str,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Materialize a DataFrame as a new Iceberg append snapshot (creating
    the table if needed): write parquet into ``data/``, then commit the
    new part files. Returns the snapshot id."""
    existing = set()
    data_dir = os.path.join(table_dir, "data")
    if os.path.isdir(data_dir):
        existing = set(glob.glob(os.path.join(data_dir, "*.parquet")))
        staging = os.path.join(table_dir, "_staging")
        df.write.mode("overwrite").parquet(staging)
        import shutil

        new_files = []
        for p in sorted(glob.glob(os.path.join(staging, "*.parquet"))):
            dst = os.path.join(
                data_dir,
                f"{hashlib.sha256(p.encode()).hexdigest()[:8]}-"
                + os.path.basename(p),
            )
            shutil.move(p, dst)
            new_files.append(dst)
        shutil.rmtree(staging)
    else:
        df.write.mode("overwrite").parquet(data_dir)
        new_files = sorted(
            p
            for p in glob.glob(os.path.join(data_dir, "*.parquet"))
            if p not in existing
        )
    return commit_append(
        table_dir, new_files, spark_schema=df.schema, timestamp_ms=timestamp_ms
    )
