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
# The partition record is PER-SPEC (one avro field per partition field,
# field-ids 1000+), so the schema is built dynamically.
_ICEBERG_TO_AVRO = {
    "string": "string",
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
    # temporal partition values travel in their spec physical encoding
    # (date = int days from epoch, timestamp = long micros from epoch)
    # and are converted back to Python date/datetime at decode
    "date": "int",
    "timestamp": "long",
}


def _part_to_avro(v, iceberg_type: str):
    """Partition value -> its Avro physical representation."""
    import datetime as _dt

    if v is None:
        return None
    if iceberg_type == "date":
        if isinstance(v, _dt.datetime):
            v = v.date()
        return (v - _dt.date(1970, 1, 1)).days
    if iceberg_type == "timestamp":
        return _ts_micros(v)
    return v


def _part_from_avro(v, iceberg_type: str):
    """Inverse of ``_part_to_avro``."""
    import datetime as _dt

    if v is None:
        return None
    if iceberg_type == "date":
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
    if iceberg_type == "timestamp":
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v)
    return v


def _partition_record_schema(part_fields: list[dict]) -> dict:
    """Avro record type for data_file.partition under a given spec:
    one nullable field per partition field (spec field-ids 1000+)."""
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": pf["name"],
                "type": ["null", _ICEBERG_TO_AVRO[pf["iceberg_type"]]],
                "default": None,
                "field-id": pf["field-id"],
            }
            for pf in part_fields
        ],
    }


def _data_file_schema(part_fields: list[dict]) -> dict:
    return {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": _partition_record_schema(part_fields),
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            # per-column value bounds (spec fields 125/128: map<field-id,
            # binary> encoded as k/v record arrays) — the zone maps that
            # let a reader skip files on non-partition predicates
            {
                "name": "lower_bounds",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "items": {
                            "type": "record",
                            "name": "k126_v127",
                            "fields": [
                                {"name": "key", "type": "int", "field-id": 126},
                                {"name": "value", "type": "bytes", "field-id": 127},
                            ],
                        },
                    },
                ],
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": [
                    "null",
                    {
                        "type": "array",
                        "items": {
                            "type": "record",
                            "name": "k129_v130",
                            "fields": [
                                {"name": "key", "type": "int", "field-id": 129},
                                {"name": "value", "type": "bytes", "field-id": 130},
                            ],
                        },
                    },
                ],
                "default": None,
                "field-id": 128,
            },
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int"}],
                "default": None,
                "field-id": 135,
            },
            {
                "name": "sort_order_id",
                "type": ["null", "int"],
                "default": None,
                "field-id": 140,
            },
        ],
    }


def manifest_entry_schema(part_fields: list[dict] | None = None) -> dict:
    return {
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
            {
                "name": "data_file",
                "type": _data_file_schema(part_fields or []),
                "field-id": 2,
            },
        ],
    }


# kept for callers/tests that reference the unpartitioned shape
MANIFEST_ENTRY_SCHEMA = manifest_entry_schema([])

# manifest_file.partitions (spec field 507): per-partition-field value
# summaries used for MANIFEST-LEVEL pruning — a reader can skip an entire
# manifest when the filter value falls outside [lower, upper].
_FIELD_SUMMARY_SCHEMA = {
    "type": "record",
    "name": "r507",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {
            "name": "contains_nan",
            "type": ["null", "boolean"],
            "default": None,
            "field-id": 518,
        },
        {
            "name": "lower_bound",
            "type": ["null", "bytes"],
            "default": None,
            "field-id": 510,
        },
        {
            "name": "upper_bound",
            "type": ["null", "bytes"],
            "default": None,
            "field-id": 511,
        },
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
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": _FIELD_SUMMARY_SCHEMA}],
            "default": None,
            "field-id": 507,
        },
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


# --------------------------------------------------------------------------
# single-value binary (de)serialization for partition bounds
# (spec "Binary single-value serialization")
# --------------------------------------------------------------------------


def _ts_micros(value) -> int:
    """datetime/pandas.Timestamp -> int64 micros from epoch (spec
    single-value serialization for timestamp). Aware values are
    normalized to UTC; naive values are taken as-is (timestamp_ntz)."""
    import datetime as _dt

    if value.tzinfo is not None:
        value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return (value - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)


def _bound_bytes(value, iceberg_type: str) -> bytes:
    import datetime as _dt
    import struct

    if iceberg_type == "string":
        return str(value).encode("utf-8")
    if iceberg_type == "long":
        return struct.pack("<q", int(value))
    if iceberg_type == "int":
        return struct.pack("<i", int(value))
    if iceberg_type == "double":
        return struct.pack("<d", float(value))
    if iceberg_type == "float":
        return struct.pack("<f", float(value))
    if iceberg_type == "boolean":
        return b"\x01" if value else b"\x00"
    if iceberg_type == "date":
        # spec Appendix D: int32 days from 1970-01-01, little-endian
        if isinstance(value, _dt.datetime):
            value = value.date()
        return struct.pack("<i", (value - _dt.date(1970, 1, 1)).days)
    if iceberg_type == "timestamp":
        # spec Appendix D: int64 microseconds from epoch, little-endian
        return struct.pack("<q", _ts_micros(value))
    raise NotImplementedError(f"bound serialization for {iceberg_type!r}")


def _bound_value(raw: bytes | None, iceberg_type: str):
    import struct

    if raw is None:
        return None
    raw = bytes(raw)
    if iceberg_type == "string":
        return raw.decode("utf-8")
    if iceberg_type == "long":
        return struct.unpack("<q", raw)[0]
    if iceberg_type == "int":
        return struct.unpack("<i", raw)[0]
    if iceberg_type == "double":
        return struct.unpack("<d", raw)[0]
    if iceberg_type == "float":
        return struct.unpack("<f", raw)[0]
    if iceberg_type == "boolean":
        return raw != b"\x00"
    if iceberg_type == "date":
        import datetime as _dt

        return _dt.date(1970, 1, 1) + _dt.timedelta(
            days=struct.unpack("<i", raw)[0]
        )
    if iceberg_type == "timestamp":
        import datetime as _dt

        return _dt.datetime(1970, 1, 1) + _dt.timedelta(
            microseconds=struct.unpack("<q", raw)[0]
        )
    raise NotImplementedError(f"bound deserialization for {iceberg_type!r}")


def partition_fields(meta: dict, spec_id: int | None = None) -> list[dict]:
    """One partition spec (default when ``spec_id`` is None) resolved
    against the current schema ->
    [{name, field-id, source-id, source_name, source_type, transform
    (kind), param, iceberg_type}]. ``iceberg_type`` is the type of the
    transform RESULT — the type partition tuples, hive dir values, and
    manifest field-summary bounds carry (int for bucket/days, the source
    type for identity/truncate). Tables carry EVERY spec they ever had
    (spec evolution): manifests name theirs by id and readers resolve
    per manifest."""
    from tfidf_spark.sources import iceberg_transforms as T

    if spec_id is None:
        spec_id = meta.get("default-spec-id", 0)
    spec = next(
        s for s in meta.get("partition-specs", []) if s["spec-id"] == spec_id
    )
    schema = next(
        s
        for s in meta.get("schemas", [])
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    types = {f["id"]: f["type"] for f in schema["fields"]}
    names = {f["id"]: f["name"] for f in schema["fields"]}
    out = []
    for pf in spec.get("fields", []):
        kind, param = T.parse_transform(pf["transform"])
        src_type = types[pf["source-id"]]
        out.append(
            {
                "name": pf["name"],
                "field-id": pf["field-id"],
                "source-id": pf["source-id"],
                "source_name": names[pf["source-id"]],
                "source_type": src_type,
                "transform": kind,
                "param": param,
                "iceberg_type": T.result_type(kind, src_type),
            }
        )
    return out


def _coerce_source(value, source_type: str):
    """Coerce a user-supplied filter value to the partition SOURCE
    column's Iceberg type before transforming/comparing — the CLI always
    passes strings, and an uncoerced string never matches a decoded
    numeric bound (silent full prune) or raises on `lo <= v <= hi`."""
    return _coerce(value, source_type)


def _normalize_filter(
    partition_filter: dict | None,
    pfields: list[dict] | None = None,
    unknown_ok: bool = False,
) -> dict[str, set] | None:
    """User filter -> {spec_field_name: allowed TRANSFORMED values}.

    Filter keys are SOURCE column names: each spec field derived from
    that column gets the filter values coerced to the source type and
    pushed through its transform (identity passes them unchanged, so the
    historical {col: value} form behaves as before). A key matching a
    spec FIELD name (and no source column) is taken as already
    transformed. Unknown keys raise in ``snapshot_entries``."""
    from tfidf_spark.sources import iceberg_transforms as T

    if not partition_filter:
        return None
    norm = {
        k: set(v) if isinstance(v, (list, tuple, set, frozenset)) else {v}
        for k, v in partition_filter.items()
    }
    if pfields is None:
        return norm
    by_source: dict[str, list[dict]] = {}
    by_field = {pf["name"]: pf for pf in pfields}
    for pf in pfields:
        by_source.setdefault(pf["source_name"], []).append(pf)
    out: dict[str, set] = {}
    unknown = []
    for key, vals in norm.items():
        if key in by_source:
            for pf in by_source[key]:
                out.setdefault(pf["name"], set()).update(
                    T.transform_value(
                        pf["transform"],
                        pf["param"],
                        _coerce_source(v, pf["source_type"]),
                        pf["source_type"],
                    )
                    for v in vals
                )
        elif key in by_field:
            pf = by_field[key]
            out.setdefault(key, set()).update(
                _coerce(v, pf["iceberg_type"]) for v in vals
            )
        else:
            unknown.append(key)
    if unknown and not unknown_ok:
        raise ValueError(
            f"partition filter on non-partition columns: {sorted(unknown)}"
        )
    return out


def snapshot_entries(
    table_dir: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    spark=None,
    distributed_manifest_threshold: int | None = None,
    range_filter: dict | None = None,
) -> dict:
    """Full spec resolution of one snapshot -> ::

        {"snapshot_id": int,
         "partition_fields": [...],          # identity spec fields
         "data": [{"path", "partition", "seq", "record_count"}],
         "pos_deletes": [{"path", "seq"}],
         "eq_deletes": [{"path", "seq", "equality_cols"}]}

    ``partition_filter`` ({col: value-or-list}) prunes at BOTH levels the
    spec provides: whole manifests via the manifest list's per-field
    [lower_bound, upper_bound] summaries (field 507), then individual
    files via their exact partition tuples — the same two-level skip a
    real Iceberg reader performs, so a filtered scan never opens
    manifests (or lists files) outside the requested partitions. Delete
    files are scoped by sequence number downstream (position: data_seq <=
    delete_seq; equality: data_seq < delete_seq).

    ``range_filter`` ({col: (lo, hi)}, inclusive, None endpoint = open)
    prunes files on the manifests' per-COLUMN value bounds (spec fields
    125/128 — the zone maps): a file whose recorded [min, max] for the
    column cannot intersect the requested range is skipped without
    opening it. Bounds are written from parquet footer statistics at
    commit time for numeric/boolean/temporal columns; files without
    bounds are never pruned (always safe). Values are coerced to the
    column's type, so CLI strings work.

    When ``spark`` is passed and the (post-pruning) manifest count
    reaches ``distributed_manifest_threshold`` (default 64, env
    ``TFIDF_ICEBERG_DISTRIBUTED_MANIFESTS``), the per-manifest Avro
    decode fans out to executors instead of running serially on the
    driver — the planning bottleneck at 10^12-file scale, where one
    snapshot holds tens of thousands of manifests."""
    if distributed_manifest_threshold is None:
        distributed_manifest_threshold = int(
            os.environ.get("TFIDF_ICEBERG_DISTRIBUTED_MANIFESTS", "64")
        )
    meta = current_metadata(table_dir)
    snap = resolve_snapshot(meta, snapshot_id)
    # historical schemas first, CURRENT schema last so equality-delete
    # key columns always resolve to current names
    id_to_col = {}
    for s in sorted(
        meta.get("schemas", []),
        key=lambda s: s.get("schema-id", 0) == meta.get("current-schema-id", 0),
    ):
        for f in s["fields"]:
            id_to_col[f["id"]] = f["name"]

    # field-id-based column resolution (schema evolution): every data /
    # equality-delete entry records the schema its file was WRITTEN
    # under (via its adding snapshot's schema-id), and readers map those
    # column names to the current schema's through the immutable field
    # ids — so files written before an ALTER TABLE RENAME COLUMN keep
    # reading correctly instead of silently dropping the renamed column
    snap_schema_ids = {
        s["snapshot-id"]: s.get("schema-id", 0)
        for s in meta.get("snapshots", [])
    }
    current_schema_id = meta.get("current-schema-id", 0)
    schemas_by_id = {
        s.get("schema-id", 0): {f["id"]: f["name"] for f in s["fields"]}
        for s in meta.get("schemas", [])
    }

    mlist_path = _strip_file_uri(snap["manifest-list"])
    _, manifests = read_container(mlist_path)

    # partition-SPEC evolution: each manifest names the spec its files
    # were written under (field 502); resolve fields, filter and tuple
    # types PER SPEC so time travel across a rewrite_table(partition_by=
    # new_spec) reads both eras correctly. Filter keys are source column
    # names (coerced to the source type, then pushed through each
    # derived field's transform) — so callers filter `{"repo": "x"}`
    # identically on identity- and bucket-partitioned tables; a key a
    # given spec cannot express simply doesn't prune that spec's
    # manifests (the exact row predicate still applies downstream), but
    # a key NO spec knows raises.
    default_sid = meta.get("default-spec-id", 0)
    spec_ids = {mf.get("partition_spec_id", 0) for mf in manifests}
    spec_ids.add(default_sid)
    pf_by_spec = {sid: partition_fields(meta, sid) for sid in spec_ids}
    if partition_filter:
        known = {
            pf[k]
            for fields in pf_by_spec.values()
            for pf in fields
            for k in ("source_name", "name")
        }
        bad = sorted(set(partition_filter) - known)
        if bad:
            raise ValueError(
                f"partition filter on non-partition columns: {bad}"
            )
    flt_by_spec = {
        sid: _normalize_filter(
            partition_filter, pf_by_spec[sid], unknown_ok=True
        )
        for sid in spec_ids
    }
    ptypes_by_spec = {
        sid: {pf["name"]: pf["iceberg_type"] for pf in pf_by_spec[sid]}
        for sid in spec_ids
    }
    # merged view for catalog consumers (source types for exact row
    # predicates + derived names to drop); default spec's fields first
    seen_names: set = set()
    pfields = []
    for sid in [default_sid] + sorted(spec_ids - {default_sid}):
        for pf in pf_by_spec[sid]:
            if pf["name"] not in seen_names:
                seen_names.add(pf["name"])
                pfields.append(pf)
    out = {
        "snapshot_id": snap["snapshot-id"],
        "partition_fields": pfields,
        "current_schema_id": current_schema_id,
        "schemas_by_id": schemas_by_id,
        # ordered (id, name, type) of the CURRENT schema: the read path
        # projects every writer-schema file group onto exactly these
        # columns (added columns surface as typed NULLs in older files;
        # dropped columns vanish while remaining in old files)
        "current_schema_fields": [
            {"id": f["id"], "name": f["name"], "type": f["type"]}
            for s in meta.get("schemas", [])
            if s.get("schema-id", 0) == current_schema_id
            for f in s["fields"]
        ],
        "data": [],
        "pos_deletes": [],
        "eq_deletes": [],
    }
    # manifest-level pruning from the field summaries (no IO: the
    # summaries are in the manifest LIST already in hand), each manifest
    # judged under ITS spec
    survivors = [
        mf
        for mf in manifests
        if not _manifest_prunable(
            mf,
            flt_by_spec[mf.get("partition_spec_id", 0)],
            pf_by_spec[mf.get("partition_spec_id", 0)],
        )
    ]
    # normalize the range filter to (field_id, iceberg_type, lo, hi)
    # tuples under the CURRENT schema (values coerced to the column type)
    rng = None
    if range_filter:
        cur = next(
            s
            for s in meta.get("schemas", [])
            if s.get("schema-id", 0) == current_schema_id
        )
        by_name = {f["name"]: f for f in cur["fields"]}
        unknown = sorted(set(range_filter) - set(by_name))
        if unknown:
            raise ValueError(f"range filter on unknown columns: {unknown}")
        rng = []
        for col, (lo, hi) in range_filter.items():
            f = by_name[col]
            rng.append(
                (
                    f["id"],
                    f["type"],
                    None if lo is None else _coerce(lo, f["type"]),
                    None if hi is None else _coerce(hi, f["type"]),
                )
            )
    ctx = (
        flt_by_spec,
        snap_schema_ids,
        current_schema_id,
        id_to_col,
        rng,
        ptypes_by_spec,
    )
    if (
        spark is not None
        and len(survivors) >= distributed_manifest_threshold
    ):
        # distributed metadata decode: at 10^12 files a snapshot holds
        # tens of thousands of manifests — Avro-decoding them serially
        # on the driver is the planning bottleneck, so ship the decode
        # to executors (each returns its already-pruned entry dicts; the
        # driver only merges). Order-insensitive merge: entry semantics
        # carry their own sequence numbers.
        sc = spark.sparkContext
        n_slices = min(len(survivors), 256)
        decoded = sc.parallelize(survivors, n_slices).map(
            lambda mf: _decode_manifest(mf, *ctx)
        ).collect()
    else:
        decoded = [_decode_manifest(mf, *ctx) for mf in survivors]
    for data, pos, eq in decoded:
        out["data"].extend(data)
        out["pos_deletes"].extend(pos)
        out["eq_deletes"].extend(eq)
    return out


def _manifest_prunable(mf: dict, flt: dict | None, pfields: list[dict]) -> bool:
    """True when the manifest list's per-field [lower, upper] summaries
    prove no file in the manifest can match the filter."""
    if not flt or not mf.get("partitions"):
        return False
    for pf, summary in zip(pfields, mf["partitions"]):
        want = flt.get(pf["name"])
        if want is None:
            continue
        lo = _bound_value(summary.get("lower_bound"), pf["iceberg_type"])
        hi = _bound_value(summary.get("upper_bound"), pf["iceberg_type"])
        if (
            lo is not None
            and hi is not None
            and not any(lo <= v <= hi for v in want)
            and not summary.get("contains_null", False)
        ):
            return True
    return False


def _range_prunable(df: dict, rng: list | None) -> bool:
    """True when the data file's column bounds (spec 125/128) prove no
    row can satisfy the range filter. Missing bounds never prune."""
    if not rng:
        return False
    lo_map = {e["key"]: e["value"] for e in (df.get("lower_bounds") or [])}
    hi_map = {e["key"]: e["value"] for e in (df.get("upper_bounds") or [])}
    for fid, typ, lo, hi in rng:
        if fid not in lo_map or fid not in hi_map:
            continue
        blo = _bound_value(lo_map[fid], typ)
        bhi = _bound_value(hi_map[fid], typ)
        if hi is not None and blo > hi:
            # safe for float/double too: the row predicate col <= hi
            # excludes NaN (Spark orders NaN above every double)
            return True
        if lo is not None and bhi < lo:
            # parquet footer min/max EXCLUDE NaN, but with an open upper
            # endpoint the row predicate col >= lo KEEPS NaN rows — a
            # file whose non-NaN max < lo may still hold matching NaN
            # rows, so float/double can only take this prune direction
            # when a closed upper bound excludes NaN anyway
            if typ not in ("float", "double") or hi is not None:
                return True
    return False


def _decode_manifest(
    mf: dict,
    flt_by_spec: dict | None,
    snap_schema_ids: dict,
    current_schema_id: int,
    id_to_col: dict,
    rng: list | None = None,
    ptypes_by_spec: dict | None = None,
) -> tuple[list, list, list]:
    """Decode ONE manifest -> (data, pos_deletes, eq_deletes) entry
    lists, file-level-pruned. The manifest's own spec id selects its
    normalized filter and partition-tuple types (spec evolution).
    Module-level and driver-state-free so the distributed path can run
    it on executors (manifest paths must be on storage all nodes see,
    as Iceberg metadata always is)."""
    sid = mf.get("partition_spec_id", 0)
    flt = (flt_by_spec or {}).get(sid)
    part_types = (ptypes_by_spec or {}).get(sid)
    data: list = []
    pos: list = []
    eq: list = []
    _, entries = read_container(_strip_file_uri(mf["manifest_path"]))
    for e in entries:
        if e["status"] == STATUS_DELETED:
            continue
        df = e["data_file"]
        if df["file_format"].upper() != "PARQUET":
            raise NotImplementedError(
                f"unsupported data file format {df['file_format']!r}"
            )
        # the entry's data sequence number: explicit, or inherited
        # from the manifest that added it (spec inheritance rule)
        seq = e.get("sequence_number")
        if seq is None:
            seq = mf["sequence_number"]
        content = df.get("content", CONTENT_DATA)
        path = _strip_file_uri(df["file_path"])
        # spec: data files live in content=0 manifests, delete files
        # in content=1 manifests — a mismatch is corrupt metadata
        if (mf.get("content", 0) != 0) != (content != CONTENT_DATA):
            raise ValueError(
                f"corrupt manifest {mf['manifest_path']}: "
                f"manifest content={mf.get('content', 0)} holds a "
                f"data_file with content={content}"
            )
        schema_id = snap_schema_ids.get(e.get("snapshot_id"), current_schema_id)
        if content == CONTENT_DATA:
            part = {
                k: _part_from_avro(v, (part_types or {}).get(k, ""))
                for k, v in (df.get("partition") or {}).items()
            }
            if flt and any(
                name in part and part[name] not in want
                for name, want in flt.items()
            ):
                continue
            if _range_prunable(df, rng):
                continue
            data.append(
                {
                    "path": path,
                    "partition": dict(part),
                    "seq": seq,
                    "record_count": df.get("record_count", 0),
                    "schema_id": schema_id,
                }
            )
        elif content == CONTENT_POSITION_DELETES:
            pos.append(
                {
                    "path": path,
                    "seq": seq,
                    "record_count": df.get("record_count", 0),
                }
            )
        elif content == CONTENT_EQUALITY_DELETES:
            ids = df.get("equality_ids") or []
            eq.append(
                {
                    "path": path,
                    "seq": seq,
                    "equality_cols": [id_to_col[i] for i in ids],
                    "record_count": df.get("record_count", 0),
                    "schema_id": schema_id,
                }
            )
        else:
            raise NotImplementedError(f"data_file.content={content}")
    return data, pos, eq


def live_data_files(
    table_dir: str, snapshot_id: int | None = None
) -> tuple[list[str], int]:
    """-> (live parquet file paths at the snapshot, resolved snapshot id).

    Plain-files view for callers that scan parquet directly WITHOUT
    merge-on-read semantics; a snapshot carrying live delete files raises
    loudly here (reading the data files alone would resurrect deleted
    rows) — use ``catalog.read_table`` / ``snapshot_entries`` instead."""
    ent = snapshot_entries(table_dir, snapshot_id=snapshot_id)
    if ent["pos_deletes"] or ent["eq_deletes"]:
        raise NotImplementedError(
            "snapshot carries merge-on-read delete files; read it through "
            "catalog.read_table (applies them) or compact the table"
        )
    return [d["path"] for d in ent["data"]], ent["snapshot_id"]


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
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
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


def _field_summaries(
    pfields: list[dict], parts: list[dict]
) -> list[dict] | None:
    """Per-partition-field value summaries over a manifest's entries
    (manifest_file.partitions, spec field 507) — the data manifest-level
    pruning reads back in ``snapshot_entries``."""
    if not pfields:
        return None
    out = []
    for pf in pfields:
        vals = [p.get(pf["name"]) for p in parts]
        nonnull = [v for v in vals if v is not None]
        out.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": None,
                "lower_bound": (
                    _bound_bytes(min(nonnull), pf["iceberg_type"])
                    if nonnull
                    else None
                ),
                "upper_bound": (
                    _bound_bytes(max(nonnull), pf["iceberg_type"])
                    if nonnull
                    else None
                ),
            }
        )
    return out


# column bounds are emitted only for these types: parquet writers may
# TRUNCATE string/binary statistics, and a truncated upper bound is not
# a valid upper bound without byte-increment repair — numeric stats are
# always exact
_BOUNDED_TYPES = {"int", "long", "double", "float", "boolean", "date", "timestamp"}


def _parquet_column_bounds(path: str, bound_cols: dict) -> tuple[dict, dict]:
    """Aggregate per-column [min, max] across a parquet file's row-group
    footer statistics (no data scan) -> ({field_id: bytes}, ...) in the
    spec's single-value binary serialization. Columns without complete
    stats are skipped (absent bounds = never prunable, always safe)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    complete: set = set()
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            name = col.path_in_schema
            if name not in bound_cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                mins.pop(name, None)
                maxs.pop(name, None)
                complete.add(name)  # poisoned: at least one group lacks stats
                continue
            if name in complete:
                continue
            mins[name] = st.min if name not in mins else min(mins[name], st.min)
            maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
    lo_out: dict = {}
    hi_out: dict = {}
    for name, v in mins.items():
        fid, typ = bound_cols[name]
        try:
            lo_out[fid] = _bound_bytes(v, typ)
            hi_out[fid] = _bound_bytes(maxs[name], typ)
        except (NotImplementedError, ValueError, TypeError):
            lo_out.pop(fid, None)
            hi_out.pop(fid, None)
    return lo_out, hi_out


def _write_manifest(
    md: str,
    files: list,
    snapshot_id: int,
    seq: int,
    pfields: list[dict] | None = None,
    content: int = CONTENT_DATA,
    equality_ids: list[int] | None = None,
    bound_cols: dict | None = None,
    spec_id: int = 0,
) -> dict:
    """Write one manifest for ``files`` — each a path or a
    ``(path, partition_dict)`` pair — and return its manifest_file record
    for the manifest list. ``content`` selects data vs position/equality
    delete manifests (merge-on-read). ``spec_id`` is recorded in the
    manifest-list entry (spec field 502) and the Avro header so readers
    resolve each manifest's partition tuples under the spec it was
    written with (partition-spec evolution)."""
    pfields = pfields or []
    pairs = [(p, {}) if isinstance(p, str) else (p[0], dict(p[1])) for p in files]
    part_types = {pf["name"]: pf["iceberg_type"] for pf in pfields}
    entries = []
    total_rows = 0
    for p, part in pairs:
        part = {
            k: _part_to_avro(v, part_types.get(k, "")) for k, v in part.items()
        }
        size = os.path.getsize(p)
        lo = hi = None
        if content == CONTENT_DATA and bound_cols:
            lo_ids, hi_ids = _parquet_column_bounds(p, bound_cols)
            if lo_ids:
                lo = [{"key": k, "value": v} for k, v in sorted(lo_ids.items())]
                hi = [{"key": k, "value": v} for k, v in sorted(hi_ids.items())]
        entries.append(
            {
                "status": STATUS_ADDED,
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest
                "file_sequence_number": None,
                "data_file": {
                    "content": content,
                    "file_path": os.path.abspath(p),
                    "file_format": "PARQUET",
                    "partition": part,
                    "record_count": _parquet_row_count(p),
                    "file_size_in_bytes": size,
                    "lower_bounds": lo,
                    "upper_bounds": hi,
                    "equality_ids": equality_ids,
                    "sort_order_id": None,
                },
            }
        )
        total_rows += entries[-1]["data_file"]["record_count"]
    from tfidf_spark.sources import iceberg_transforms as T

    spec_fields_json = json.dumps(
        [
            {
                "name": pf["name"],
                "transform": T.transform_str(
                    pf.get("transform", "identity"), pf.get("param")
                ),
                "source-id": pf["source-id"],
                "field-id": pf["field-id"],
            }
            for pf in pfields
        ]
    ).encode()
    # the snapshot id is part of the name: re-committing the same file
    # set later (e.g. a retried delete commit) must write a NEW manifest,
    # never overwrite one an earlier snapshot's manifest list references
    # (committed manifests are immutable; overwriting mutates time-travel
    # history)
    name = (
        "m-"
        + hashlib.sha256(
            (repr(sorted(p for p, _ in pairs)) + f"|{snapshot_id}|{seq}").encode()
        ).hexdigest()[:16]
        + ".avro"
    )
    path = os.path.join(md, name)
    write_container(
        path,
        manifest_entry_schema(pfields),
        entries,
        extra_meta={
            "schema": b"{}",
            "partition-spec": spec_fields_json,
            "partition-spec-id": str(spec_id).encode(),
            "format-version": b"2",
            "content": {
                CONTENT_DATA: b"data",
                CONTENT_POSITION_DELETES: b"deletes",
                CONTENT_EQUALITY_DELETES: b"deletes",
            }[content],
        },
    )
    return {
        "manifest_path": os.path.abspath(path),
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": spec_id,
        "content": 0 if content == CONTENT_DATA else 1,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(pairs),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": total_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": _field_summaries(pfields, [part for _, part in pairs]),
    }


def _parquet_row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _commit(
    table_dir: str,
    files: list,
    content: int,
    operation: str,
    spark_schema=None,
    timestamp_ms: int = 1_700_000_000_000,
    partition_by: list[str] | None = None,
    equality_ids: list[int] | None = None,
    carry_prior: bool = True,
    sort_by: list[str] | None = None,
    summary_extra: dict | None = None,
) -> int:
    """Shared commit core: write one manifest for ``files`` (data or
    delete content), carry prior manifests BY REFERENCE in a new manifest
    list (unless ``carry_prior=False`` — a REPLACE commit), append the
    snapshot to a new metadata.json, bump version-hint. Deterministic:
    ids derive from file lists, the timestamp is a parameter."""
    if spark_schema is not None:
        # Iceberg 'timestamp' is stored here as the TZ-free flavor
        # (catalog._ICEBERG_TO_SPARK casts added-column NULLs to
        # timestamp_ntz), but _SPARK_TO_ICEBERG also accepts Spark's
        # session-TZ TIMESTAMP — letting one in would mix NTZ NULL
        # projections (old files) with LTZ data (new files) across
        # writer-schema groups (ADVICE r7 #4). Refuse loudly at write
        # time so the declared flavor invariant holds end to end.
        for f in spark_schema.fields:
            if f.dataType.simpleString() == "timestamp":
                raise NotImplementedError(
                    f"column {f.name!r} is Spark TIMESTAMP (session-TZ); "
                    "this table format stores the TZ-free flavor only — "
                    "cast to timestamp_ntz (or date) before writing"
                )
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
        if content != CONTENT_DATA:
            raise ValueError("a table cannot start with a delete snapshot")
        from tfidf_spark.sources import iceberg_transforms as T

        col_ids = {f.name: i for i, f in enumerate(spark_schema.fields, 1)}
        spec_fields = []
        for i, spec_txt in enumerate(partition_by or []):
            col, kind, param = T.parse_partition_by(spec_txt)
            if col not in col_ids:
                raise ValueError(f"partition column {col!r} not in schema")
            spec_fields.append(
                {
                    "name": T.default_field_name(kind, param, col),
                    "transform": T.transform_str(kind, param),
                    "source-id": col_ids[col],
                    "field-id": 1000 + i,
                }
            )
        for c in sort_by or []:
            if c not in col_ids:
                raise ValueError(f"sort column {c!r} not in schema")
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
                "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
                "default-sort-order-id": 1 if sort_by else 0,
                "sort-orders": (
                    [{"order-id": 0, "fields": []}]
                    + (
                        [
                            {
                                "order-id": 1,
                                "fields": [
                                    {
                                        "transform": "identity",
                                        "source-id": col_ids[c],
                                        "direction": "asc",
                                        "null-order": "nulls-first",
                                    }
                                    for c in sort_by
                                ],
                            }
                        ]
                        if sort_by
                        else []
                    )
                ),
                "properties": {},
                "current-snapshot-id": -1,
                "snapshots": [],
                "snapshot-log": [],
                "metadata-log": [],
            }
        version = 1
    pfields = partition_fields(meta)
    # coerce hive-string partition values to the spec's column types so
    # bounds and entry tuples are typed consistently
    typed_files = []
    for f in files:
        if isinstance(f, str):
            typed_files.append(f)
        else:
            p, part = f
            typed_files.append(
                (p, {pf["name"]: _coerce(part.get(pf["name"]), pf["iceberg_type"]) for pf in pfields})
            )

    parent = meta.get("current-snapshot-id")
    parent = None if parent in (None, -1) else parent
    seq = int(meta.get("last-sequence-number", 0)) + 1
    paths = [f if isinstance(f, str) else f[0] for f in typed_files]
    snapshot_id = _snapshot_id_for(paths, parent)

    cur_schema = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    bound_cols = {
        f["name"]: (f["id"], f["type"])
        for f in cur_schema["fields"]
        if f["type"] in _BOUNDED_TYPES
    }
    manifest = _write_manifest(
        md,
        typed_files,
        snapshot_id,
        seq,
        pfields=pfields,
        content=content,
        equality_ids=equality_ids,
        bound_cols=bound_cols,
        spec_id=meta.get("default-spec-id", 0),
    )
    carried = []
    if parent is not None and carry_prior:
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
    total_rows = sum(
        m["added_rows_count"] + m.get("existing_rows_count", 0)
        for m in manifests
        if m.get("content", 0) == 0
    )
    key = "added-data-files" if content == CONTENT_DATA else "added-delete-files"
    snap = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": timestamp_ms,
        "manifest-list": os.path.abspath(mlist_path),
        "schema-id": meta.get("current-schema-id", 0),
        "summary": {
            "operation": operation,
            key: str(manifest["added_files_count"]),
            "added-records": str(added_rows),
            "total-records": str(total_rows),
            "total-data-files": str(
                sum(
                    m["added_files_count"]
                    for m in manifests
                    if m.get("content", 0) == 0
                )
            ),
            **{k: str(v) for k, v in (summary_extra or {}).items()},
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


def _coerce(value, iceberg_type: str):
    import datetime as _dt

    if value is None:
        return None
    if iceberg_type in ("long", "int"):
        return int(value)
    if iceberg_type in ("double", "float"):
        return float(value)
    if iceberg_type == "boolean":
        return value in (True, "true", "True", 1)
    if iceberg_type == "timestamp":
        if not isinstance(value, _dt.datetime):
            value = _dt.datetime.fromisoformat(str(value))
        # bounds are stored/compared as naive micros (timestamp_ntz
        # semantics); normalize aware inputs to UTC-naive
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return value
    if iceberg_type == "date":
        if isinstance(value, _dt.datetime):
            return value.date()
        if isinstance(value, _dt.date):
            return value
        return _dt.date.fromisoformat(str(value))
    return str(value)


def commit_append(
    table_dir: str,
    new_data_files: list,
    spark_schema=None,
    timestamp_ms: int = 1_700_000_000_000,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    summary_extra: dict | None = None,
) -> int:
    """Append ``new_data_files`` — paths, or ``(path, partition_dict)``
    pairs for a partitioned table — as a new snapshot; creates the table
    (with an identity partition spec over ``partition_by``) on first
    commit. ``summary_extra`` entries land in the snapshot summary
    (e.g. the streaming batch id for exactly-once restart). Returns the
    new snapshot id."""
    return _commit(
        table_dir,
        new_data_files,
        CONTENT_DATA,
        "append",
        spark_schema=spark_schema,
        timestamp_ms=timestamp_ms,
        partition_by=partition_by,
        sort_by=sort_by,
        summary_extra=summary_extra,
    )


def commit_position_deletes(
    table_dir: str,
    deletes: list[tuple[str, int]],
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Merge-on-read POSITION deletes (spec "Position Delete Files"):
    write one parquet delete file of ``(file_path, pos)`` rows — sorted
    by file_path then pos as the spec requires — and commit it under a
    delete manifest (content=1). No data file is rewritten; readers apply
    the deletes to data files with data_seq <= this commit's seq
    (``catalog.read_table`` does, via an anti-join on Spark's
    ``_metadata.file_path``/``row_index`` columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sorted((os.path.abspath(p), int(pos)) for p, pos in deletes)
    table = pa.table(
        {
            "file_path": pa.array([r[0] for r in rows], pa.string()),
            "pos": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    name = (
        "pd-" + hashlib.sha256(repr(rows).encode()).hexdigest()[:16] + ".parquet"
    )
    path = os.path.join(data_dir, name)
    pq.write_table(table, path)
    return commit_position_delete_files(
        table_dir, [path], timestamp_ms=timestamp_ms
    )


def commit_position_delete_files(
    table_dir: str,
    delete_files: list[str],
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Commit ALREADY-WRITTEN position-delete parquet files (columns
    ``file_path string, pos long``, sorted) under one delete manifest —
    the distributed path: executors write the delete files
    (``catalog.delete_where``), only the metadata commit runs here."""
    return _commit(
        table_dir,
        list(delete_files),
        CONTENT_POSITION_DELETES,
        "delete",
        timestamp_ms=timestamp_ms,
    )


def commit_equality_deletes(
    table_dir: str,
    rows: list[dict],
    equality_cols: list[str],
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """Merge-on-read EQUALITY deletes (spec "Equality Delete Files"):
    one parquet file holding the delete key tuples; ``equality_ids`` in
    the manifest entry names the schema columns matched. Readers drop
    matching rows from data files with data_seq < this commit's seq."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = current_metadata(table_dir)
    schema = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    by_name = {f["name"]: f for f in schema["fields"]}
    missing = [c for c in equality_cols if c not in by_name]
    if missing:
        raise ValueError(f"equality columns not in schema: {missing}")
    _PA = {
        "string": pa.string(),
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
    }
    cols = {
        c: pa.array(
            [r[c] for r in rows], _PA[by_name[c]["type"]]
        )
        for c in equality_cols
    }
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    name = (
        "ed-"
        + hashlib.sha256(
            repr(sorted(tuple(r[c] for c in equality_cols) for r in rows)).encode()
        ).hexdigest()[:16]
        + ".parquet"
    )
    path = os.path.join(data_dir, name)
    pq.write_table(pa.table(cols), path)
    return _commit(
        table_dir, [path], CONTENT_EQUALITY_DELETES, "delete",
        timestamp_ms=timestamp_ms,
        equality_ids=[by_name[c]["id"] for c in equality_cols],
    )


def _hive_partition_of(rel_dir: str) -> dict:
    """``lang=py/source=web`` -> {"lang": "py", "source": "web"} (values
    URL-unescaped; Hive's default-partition marker -> None)."""
    from urllib.parse import unquote

    part = {}
    for seg in rel_dir.split(os.sep):
        if not seg or "=" not in seg:
            continue
        k, v = seg.split("=", 1)
        v = unquote(v)
        part[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
    return part


def _spec_from_partition_by(partition_by: list[str] | None, spark_schema) -> list[dict]:
    """User ``partition_by`` spec strings + DataFrame schema ->
    pseudo-pfields for materialization of a table's FIRST commit (the
    same shape ``partition_fields`` resolves from metadata afterwards)."""
    from tfidf_spark.sources import iceberg_transforms as T

    types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    out = []
    for spec_txt in partition_by or []:
        col, kind, param = T.parse_partition_by(spec_txt)
        if col not in types:
            raise ValueError(f"partition column {col!r} not in schema")
        src_type = _SPARK_TO_ICEBERG.get(types[col], types[col])
        if kind in ("years", "months", "days", "hours") and types[col] == "timestamp":
            # Spark TIMESTAMP (with local time zone) stores an instant;
            # F.year/F.hour read it in spark.sql.session.timeZone, so a
            # reader session TZ different from the writer's would
            # silently mis-prune. Only TZ-free sources transform
            # identically everywhere (and match the driver-side
            # transform_value's naive calendar math).
            raise NotImplementedError(
                f"time transform {kind!r} over TIMESTAMP (session-TZ) "
                f"column {col!r}: cast to timestamp_ntz or date first"
            )
        out.append(
            {
                "name": T.default_field_name(kind, param, col),
                "source_name": col,
                "transform": kind,
                "param": param,
                "source_type": src_type,
                "iceberg_type": T.result_type(kind, src_type),
            }
        )
    return out


def _materialize(
    df, table_dir: str, pfields: list[dict], sort_by: list[str] | None = None,
    sort_buckets: int | None = None,
) -> list:
    """Write ``df``'s parquet into ``data/`` (hive layout when
    partitioned) via a staging dir -> list of new files, as paths or
    ``(path, partition_dict)`` pairs. Non-identity spec fields are
    computed as DERIVED columns (JVM exprs; Arrow-vectorized murmur3 for
    bucket) just for ``partitionBy`` — the partitionBy drops them from
    the file contents, so the SOURCE column stays stored (only identity
    sources are reconstructed from hive dirs at read time)."""
    import shutil

    from tfidf_spark.sources import iceberg_transforms as T

    data_dir = os.path.join(table_dir, "data")
    staging = os.path.join(table_dir, "_staging")
    if sort_by:
        # range-cluster files on the sort key so each lands with tight,
        # mostly-disjoint column bounds (spec 125/128) — what makes the
        # zone-map pruning in snapshot_entries(range_filter=...) skip
        # whole files instead of just row groups. sort_buckets pins the
        # file count (AQE otherwise coalesces small writes to one file)
        args = ([sort_buckets] if sort_buckets else []) + list(sort_by)
        df = df.repartitionByRange(*args).sortWithinPartitions(*sort_by)
    for pf in pfields:
        if pf["transform"] != "identity":
            df = df.withColumn(
                pf["name"],
                T.transform_column(
                    pf["transform"], pf["param"], pf["source_name"], pf["source_type"]
                ),
            )
    partition_by = [pf["name"] for pf in pfields]
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    new_files = []
    for p in sorted(
        glob.glob(os.path.join(staging, "**", "*.parquet"), recursive=True)
    ):
        rel_dir = os.path.dirname(os.path.relpath(p, staging))
        dst_dir = os.path.join(data_dir, rel_dir) if rel_dir else data_dir
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(
            dst_dir,
            f"{hashlib.sha256(p.encode()).hexdigest()[:8]}-"
            + os.path.basename(p),
        )
        shutil.move(p, dst)
        if partition_by:
            new_files.append((dst, _hive_partition_of(rel_dir)))
        else:
            new_files.append(dst)
    shutil.rmtree(staging)
    return new_files


def table_sort_by(meta: dict) -> list[str]:
    """Resolve the table's default sort order to current column names
    (identity fields only — the only kind this writer records)."""
    oid = meta.get("default-sort-order-id", 0)
    order = next(
        (o for o in meta.get("sort-orders", []) if o.get("order-id") == oid),
        None,
    )
    if not order or not order.get("fields"):
        return []
    cur = next(
        s
        for s in meta.get("schemas", [])
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    names = {f["id"]: f["name"] for f in cur["fields"]}
    return [
        names[f["source-id"]]
        for f in order["fields"]
        if f.get("transform") == "identity" and f["source-id"] in names
    ]


def write_table(
    df,
    table_dir: str,
    timestamp_ms: int = 1_700_000_000_000,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    sort_buckets: int | None = None,
) -> int:
    """Materialize a DataFrame as a new Iceberg append snapshot (creating
    the table if needed): write parquet into ``data/``, then commit the
    new part files. Returns the snapshot id.

    With ``partition_by``, data files are laid out hive-style
    (``data/lang=py/...parquet``) and each manifest entry carries its
    partition tuple — so reads prune at the manifest AND file level.
    Elements are spec strings: ``"lang"`` (identity), ``"bucket(4,
    repo)"``, ``"truncate(3, path)"``, ``"days(ts)"`` — the transforms
    of the public Iceberg spec (murmur3-exact for bucket). Identity
    sources are reconstructed by Spark's partition discovery (basePath =
    ``data/``); transformed sources stay stored in the data files and
    the derived hive dirs (``repo_bucket=3``) exist only for layout +
    pruning. Appends to a partitioned table inherit the table's spec
    (``partition_by`` is only consulted on table creation)."""
    if is_iceberg_table(table_dir):
        meta = current_metadata(table_dir)
        pfields = partition_fields(meta)
        if sort_by is None:
            # appends inherit the table's recorded sort order, so the
            # clustering (and zone-map tightness) survives maintenance
            sort_by = table_sort_by(meta) or None
    else:
        pfields = _spec_from_partition_by(partition_by, df.schema)
    for c in sort_by or []:
        if c not in df.columns:
            raise ValueError(f"sort column {c!r} not in schema")
    new_files = _materialize(
        df, table_dir, pfields, sort_by=sort_by, sort_buckets=sort_buckets
    )
    return commit_append(
        table_dir,
        new_files,
        spark_schema=df.schema,
        timestamp_ms=timestamp_ms,
        partition_by=partition_by,
        sort_by=sort_by,
    )


def rewrite_table(
    df,
    table_dir: str,
    timestamp_ms: int = 1_700_000_000_000,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    sort_buckets: int | None = None,
) -> int:
    """REPLACE commit (copy-on-write compaction): materialize ``df`` as
    the table's entire new live contents — the new manifest list carries
    NO prior manifests, so all previous data AND delete files drop out of
    the live view (old snapshots still resolve for time travel until
    ``expire_snapshots``). The table-level analog of the index layer's
    ``full_compact``.

    ``partition_by`` evolves the PARTITION SPEC (round 7, VERDICT r6
    task #6): a new spec (fresh spec-id, fresh 1000+ partition field
    ids) is appended to ``partition-specs`` and becomes the default, and
    the REPLACE materializes everything under it. Old snapshots keep
    their manifests, which carry THEIR spec id (field 502) — readers
    resolve pruning per manifest, so time travel across the spec change
    stays exact. Because the only spec-changing operation is a REPLACE,
    any single snapshot's live files are all one spec."""
    if not is_iceberg_table(table_dir):
        raise ValueError(f"{table_dir} is not an Iceberg table")
    meta = current_metadata(table_dir)
    if partition_by is not None:
        # same session-TZ guard as _spec_from_partition_by (ADVICE r7 #2):
        # _append_partition_spec only sees the ICEBERG type, and
        # _SPARK_TO_ICEBERG maps both TIMESTAMP (LTZ) and TIMESTAMP_NTZ
        # to 'timestamp' — the df in hand tells the two apart.
        from tfidf_spark.sources import iceberg_transforms as T

        df_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for spec_txt in partition_by:
            col, kind, _ = T.parse_partition_by(spec_txt)
            if (
                kind in ("years", "months", "days", "hours")
                and df_types.get(col) == "timestamp"
            ):
                raise NotImplementedError(
                    f"time transform {kind!r} over TIMESTAMP (session-TZ) "
                    f"column {col!r}: cast to timestamp_ntz or date first"
                )
        _append_partition_spec(table_dir, meta, partition_by, timestamp_ms)
        meta = current_metadata(table_dir)
    pfields = partition_fields(meta)
    new_files = _materialize(
        df, table_dir, pfields, sort_by=sort_by, sort_buckets=sort_buckets
    )
    return _commit(
        table_dir,
        new_files,
        CONTENT_DATA,
        "replace",
        timestamp_ms=timestamp_ms,
        carry_prior=False,
        sort_by=sort_by,
    )


def _append_partition_spec(
    table_dir: str, meta: dict, partition_by: list[str], timestamp_ms: int
) -> int:
    """Append a new partition spec (``["bucket(4, lang)"]``-style
    strings resolved against the CURRENT schema) and make it the
    default. Partition field ids continue from the highest ever used —
    never reused across specs, like column ids. Returns the new
    spec id."""
    from tfidf_spark.sources import iceberg_transforms as T

    cur = next(
        s
        for s in meta.get("schemas", [])
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    col_ids = {f["name"]: f["id"] for f in cur["fields"]}
    col_types = {f["name"]: f["type"] for f in cur["fields"]}
    specs = list(meta.get("partition-specs", []))
    next_pfid = 1 + max(
        [pf["field-id"] for s in specs for pf in s.get("fields", [])] + [999]
    )
    new_sid = 1 + max(s.get("spec-id", 0) for s in specs)
    fields = []
    for spec_txt in partition_by:
        col, kind, param = T.parse_partition_by(spec_txt)
        if col not in col_ids:
            raise ValueError(f"partition column {col!r} not in schema")
        if kind in ("years", "months", "days", "hours") and col_types[
            col
        ] not in ("timestamp", "date"):
            raise NotImplementedError(
                f"time transform {kind!r} over {col_types[col]!r}"
            )
        fields.append(
            {
                "name": T.default_field_name(kind, param, col),
                "transform": T.transform_str(kind, param),
                "source-id": col_ids[col],
                "field-id": next_pfid,
            }
        )
        next_pfid += 1
    md = _meta_dir(table_dir)
    version = (
        max(
            int(os.path.basename(p).split(".")[0][1:])
            for p in glob.glob(os.path.join(md, "v*.metadata.json"))
        )
        + 1
    )
    meta = dict(meta)
    meta["partition-specs"] = specs + [{"spec-id": new_sid, "fields": fields}]
    meta["default-spec-id"] = new_sid
    meta["last-updated-ms"] = timestamp_ms
    with open(os.path.join(md, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(version))
    return new_sid


def rename_column(
    table_dir: str,
    old: str,
    new: str,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """``ALTER TABLE RENAME COLUMN``: append a new schema that renames
    field ``old`` to ``new`` KEEPING ITS FIELD ID (the Iceberg evolution
    rule — ids are the identity, names are labels) and point
    current-schema-id at it. No data file is touched: files written
    under the old schema keep reading through the field-id mapping in
    ``snapshot_entries``/``catalog.read_table``. Returns the new
    schema id."""
    meta = current_metadata(table_dir)
    schemas = list(meta.get("schemas", []))
    cur_id = meta.get("current-schema-id", 0)
    cur = next(s for s in schemas if s.get("schema-id", 0) == cur_id)
    names = [f["name"] for f in cur["fields"]]
    if old not in names:
        raise ValueError(f"column {old!r} not in current schema {names}")
    if new in names:
        raise ValueError(f"column {new!r} already exists in {names}")
    new_id = max(s.get("schema-id", 0) for s in schemas) + 1
    new_schema = {
        "type": "struct",
        "schema-id": new_id,
        "fields": [
            {**f, "name": new if f["name"] == old else f["name"]}
            for f in cur["fields"]
        ],
    }
    # an identity partition source cannot be renamed while it is in the
    # DEFAULT spec: future appends would write hive dirs under the NEW
    # name next to old files' dirs under the OLD name — partition
    # discovery would surface two different column names under one
    # basePath. (Transform-derived fields like repo_bucket keep the
    # source column IN the files, so renaming their source is fine; and
    # an identity source in a NON-default spec is fine too: no new files
    # are written under it, and old files' dir-derived columns carry the
    # writer-era name, which the field-id rename map resolves — so
    # rewrite_table(partition_by=new_spec) genuinely unblocks the
    # rename, per VERDICT r6 task #6.)
    src_id = next(f["id"] for f in cur["fields"] if f["name"] == old)
    default_spec = next(
        s
        for s in meta.get("partition-specs", [])
        if s.get("spec-id", 0) == meta.get("default-spec-id", 0)
    )
    for pf in default_spec.get("fields", []):
        if pf["source-id"] == src_id and pf["transform"] == "identity":
            raise NotImplementedError(
                f"column {old!r} is an identity partition source; its "
                "name is baked into the hive directory layout — "
                "rewrite_table into a new spec first"
            )

    return _commit_new_schema(table_dir, meta, new_schema, timestamp_ms)


def _commit_new_schema(
    table_dir: str, meta: dict, new_schema: dict, timestamp_ms: int
) -> int:
    """Append ``new_schema`` to the schema list, point
    current-schema-id at it, and write the next metadata.json version.
    Returns the new schema id. (Schema updates are metadata-only: no
    snapshot, no data file is touched.)"""
    md = _meta_dir(table_dir)
    version = (
        max(
            int(os.path.basename(p).split(".")[0][1:])
            for p in glob.glob(os.path.join(md, "v*.metadata.json"))
        )
        + 1
    )
    meta = dict(meta)
    meta["schemas"] = list(meta.get("schemas", [])) + [new_schema]
    meta["current-schema-id"] = new_schema["schema-id"]
    meta["last-updated-ms"] = timestamp_ms
    with open(os.path.join(md, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(version))
    return new_schema["schema-id"]


def add_column(
    table_dir: str,
    name: str,
    col_type: str,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """``ALTER TABLE ADD COLUMN``: append a new schema containing the
    column under a FRESH field id — ids are never reused, even ids of
    previously dropped columns, so late-arriving files can never
    mis-bind. No data file is touched: files written under earlier
    schemas have no physical column with the new id and surface it as
    NULL at read (``catalog._scan_entries`` projects every writer-schema
    group onto the current schema). ``col_type`` is an Iceberg primitive
    (``string``/``long``/``int``/``double``/``float``/``boolean``/
    ``binary``/``date``/``timestamp``) or the equivalent Spark
    simpleString. Returns the new schema id."""
    meta = current_metadata(table_dir)
    schemas = list(meta.get("schemas", []))
    cur = next(
        s
        for s in schemas
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    names = [f["name"] for f in cur["fields"]]
    if name in names:
        raise ValueError(f"column {name!r} already exists in {names}")
    t = col_type if col_type in _ICEBERG_TO_AVRO else _SPARK_TO_ICEBERG.get(col_type)
    if t is None:
        raise NotImplementedError(f"column type {col_type!r}")
    # fresh id: 1 + max over ALL schemas ever (dropped ids stay burned)
    new_fid = 1 + max(f["id"] for s in schemas for f in s["fields"])
    new_schema = {
        "type": "struct",
        "schema-id": 1 + max(s.get("schema-id", 0) for s in schemas),
        "fields": cur["fields"]
        + [{"id": new_fid, "name": name, "required": False, "type": t}],
    }
    return _commit_new_schema(table_dir, meta, new_schema, timestamp_ms)


def drop_column(
    table_dir: str,
    name: str,
    timestamp_ms: int = 1_700_000_000_000,
) -> int:
    """``ALTER TABLE DROP COLUMN``: append a new schema without the
    field. Data files are untouched — old files keep the physical
    column, but reads project onto the current schema so it vanishes
    from every query (and from CDC row images). Refused when the column
    is a partition source in ANY spec (partition tuples and hive dirs
    reference it), a sort-order column, or a live equality-delete key
    (the delete file could no longer be applied). Returns the new
    schema id."""
    meta = current_metadata(table_dir)
    schemas = list(meta.get("schemas", []))
    cur = next(
        s
        for s in schemas
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    by_name = {f["name"]: f for f in cur["fields"]}
    if name not in by_name:
        raise ValueError(
            f"column {name!r} not in current schema {sorted(by_name)}"
        )
    if len(cur["fields"]) == 1:
        raise ValueError("cannot drop the only column")
    fid = by_name[name]["id"]
    for spec in meta.get("partition-specs", []):
        for pf in spec.get("fields", []):
            if pf["source-id"] == fid:
                raise NotImplementedError(
                    f"column {name!r} is a partition source of spec "
                    f"{spec.get('spec-id', 0)}; rewrite_table into a new "
                    "spec first"
                )
    if name in table_sort_by(meta):
        raise NotImplementedError(
            f"column {name!r} is in the table's sort order"
        )
    if meta.get("current-snapshot-id") not in (None, -1):
        ent = snapshot_entries(table_dir)
        for e in ent["eq_deletes"]:
            if name in e["equality_cols"]:
                raise NotImplementedError(
                    f"column {name!r} keys a live equality-delete file; "
                    "compact the table first"
                )
    new_schema = {
        "type": "struct",
        "schema-id": 1 + max(s.get("schema-id", 0) for s in schemas),
        "fields": [f for f in cur["fields"] if f["id"] != fid],
    }
    return _commit_new_schema(table_dir, meta, new_schema, timestamp_ms)


def _commit_maintenance_snapshot(
    table_dir: str,
    meta: dict,
    manifests: list[dict],
    operation: str,
    summary_extra: dict,
    timestamp_ms: int,
) -> int:
    """Commit a snapshot from an EXPLICIT manifest list (maintenance
    operations build their lists by hand: merged manifests, dropped
    delete manifests, rewritten-file manifests)."""
    md = _meta_dir(table_dir)
    parent = meta.get("current-snapshot-id")
    parent = None if parent in (None, -1) else parent
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snapshot_id = _snapshot_id_for(
        [m["manifest_path"] for m in manifests], parent
    )
    mlist_path = os.path.join(md, f"snap-{snapshot_id}.avro")
    write_container(
        mlist_path,
        MANIFEST_FILE_SCHEMA,
        manifests,
        extra_meta={"format-version": b"2"},
    )
    total_rows = sum(
        m["added_rows_count"] + m.get("existing_rows_count", 0)
        for m in manifests
        if m.get("content", 0) == 0
    )
    snap = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": timestamp_ms,
        "manifest-list": os.path.abspath(mlist_path),
        "schema-id": meta.get("current-schema-id", 0),
        "summary": {
            "operation": operation,
            "total-records": str(total_rows),
            "total-data-files": str(
                sum(
                    m["added_files_count"] + m.get("existing_files_count", 0)
                    for m in manifests
                    if m.get("content", 0) == 0
                )
            ),
            **{k: str(v) for k, v in summary_extra.items()},
        },
    }
    if parent is not None:
        snap["parent-snapshot-id"] = parent
    version = (
        max(
            int(os.path.basename(p).split(".")[0][1:])
            for p in glob.glob(os.path.join(md, "v*.metadata.json"))
        )
        + 1
    )
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


def _write_existing_entries_manifest(
    md: str,
    entries: list[dict],
    pfields: list[dict],
    spec_id: int,
    snapshot_id: int,
    seq: int,
    content: int = CONTENT_DATA,
    salt: str = "",
) -> dict:
    """Write a manifest holding already-committed entries (status
    EXISTING, EXPLICIT per-entry sequence numbers — inheritance only
    applies to entries added by the manifest's own snapshot). Used by
    ``rewrite_manifests`` (merge) and ``compact_position_deletes``
    (carry minus rewritten files)."""
    from tfidf_spark.sources import iceberg_transforms as T

    out_entries = []
    decoded_parts = []
    ptypes = {pf["name"]: pf["iceberg_type"] for pf in pfields}
    for e in entries:
        e2 = dict(e)
        e2["status"] = STATUS_EXISTING
        if e2.get("sequence_number") is None:
            raise ValueError("existing entry requires an explicit sequence")
        if e2.get("file_sequence_number") is None:
            e2["file_sequence_number"] = e2["sequence_number"]
        out_entries.append(e2)
        decoded_parts.append(
            {
                k: _part_from_avro(v, ptypes.get(k, ""))
                for k, v in (e["data_file"].get("partition") or {}).items()
            }
        )
    name = (
        "m-"
        + hashlib.sha256(
            (
                repr(sorted(e["data_file"]["file_path"] for e in out_entries))
                + f"|{snapshot_id}|{seq}|existing|{salt}"
            ).encode()
        ).hexdigest()[:16]
        + ".avro"
    )
    path = os.path.join(md, name)
    spec_fields_json = json.dumps(
        [
            {
                "name": pf["name"],
                "transform": T.transform_str(
                    pf.get("transform", "identity"), pf.get("param")
                ),
                "source-id": pf["source-id"],
                "field-id": pf["field-id"],
            }
            for pf in pfields
        ]
    ).encode()
    write_container(
        path,
        manifest_entry_schema(pfields),
        out_entries,
        extra_meta={
            "schema": b"{}",
            "partition-spec": spec_fields_json,
            "partition-spec-id": str(spec_id).encode(),
            "format-version": b"2",
            "content": b"data" if content == CONTENT_DATA else b"deletes",
        },
    )
    rows = sum(e["data_file"].get("record_count", 0) for e in out_entries)
    return {
        "manifest_path": os.path.abspath(path),
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": spec_id,
        "content": 0 if content == CONTENT_DATA else 1,
        "sequence_number": seq,
        "min_sequence_number": min(
            e["sequence_number"] for e in out_entries
        ),
        "added_snapshot_id": snapshot_id,
        "added_files_count": 0,
        "existing_files_count": len(out_entries),
        "deleted_files_count": 0,
        "added_rows_count": 0,
        "existing_rows_count": rows,
        "deleted_rows_count": 0,
        "partitions": _field_summaries(pfields, decoded_parts),
    }


def _live_entries_with_seq(mf: dict) -> list[dict]:
    """A manifest's live entries with sequence numbers made explicit
    (resolving the inheritance rule against the manifest record)."""
    _, entries = read_container(_strip_file_uri(mf["manifest_path"]))
    out = []
    for e in entries:
        if e["status"] == STATUS_DELETED:
            continue
        e = dict(e)
        if e.get("sequence_number") is None:
            e["sequence_number"] = mf["sequence_number"]
        out.append(e)
    return out


def rewrite_manifests(
    table_dir: str,
    target_manifests: int = 1,
    timestamp_ms: int = 1_700_000_000_000,
) -> dict:
    """Merge the current snapshot's small DATA manifests into at most
    ``target_manifests`` per partition spec (VERDICT r6 task #7) — the
    maintenance that keeps planning O(manifests) sane as commits
    accumulate: every append adds a manifest, and at 10^12-file scale an
    un-merged table makes ``snapshot_entries`` decode tens of thousands
    of tiny Avro files per query. Entries are re-emitted as EXISTING
    with explicit sequence numbers and their original adding
    snapshot_id, so delete scoping and writer-schema resolution are
    untouched — reads stay row-identical. Delete manifests pass through
    unchanged. Metadata-only: no data file is touched, so the snapshot
    is summary-flagged ``rewrite-manifests`` and CDC treats it as a
    no-op instead of refusing the window. Returns
    ``{"before": n, "after": n, "snapshot_id": id}``."""
    meta = current_metadata(table_dir)
    snap = resolve_snapshot(meta)
    md = _meta_dir(table_dir)
    _, manifests = read_container(_strip_file_uri(snap["manifest-list"]))
    data_mfs = [m for m in manifests if m.get("content", 0) == 0]
    other_mfs = [m for m in manifests if m.get("content", 0) != 0]
    by_spec: dict[int, list[dict]] = {}
    for mf in data_mfs:
        by_spec.setdefault(mf.get("partition_spec_id", 0), []).append(mf)
    if all(len(mfs) <= target_manifests for mfs in by_spec.values()):
        return {
            "before": len(data_mfs),
            "after": len(data_mfs),
            "snapshot_id": snap["snapshot-id"],
        }
    parent = meta.get("current-snapshot-id")
    seq = int(meta.get("last-sequence-number", 0)) + 1
    new_snapshot_id = _snapshot_id_for(
        [m["manifest_path"] for m in manifests], parent
    )
    merged = []
    for sid in sorted(by_spec):
        pfields = partition_fields(meta, sid)
        entries = [
            e for mf in by_spec[sid] for e in _live_entries_with_seq(mf)
        ]
        per = max(1, -(-len(entries) // target_manifests))
        for i in range(0, len(entries), per):
            merged.append(
                _write_existing_entries_manifest(
                    md,
                    entries[i : i + per],
                    pfields,
                    sid,
                    new_snapshot_id,
                    seq,
                    salt=str(i),
                )
            )
    new_id = _commit_maintenance_snapshot(
        table_dir,
        meta,
        merged + other_mfs,
        "replace",
        {
            "rewrite-manifests": "true",
            "manifests-replaced": len(data_mfs),
            "manifests-created": len(merged),
        },
        timestamp_ms,
    )
    return {"before": len(data_mfs), "after": len(merged), "snapshot_id": new_id}


def _rewrite_file_minus_positions(src: str, dst: str, positions: list[int]) -> int:
    """Copy ``src`` parquet to ``dst`` without the given row positions
    -> surviving row count. Module-level so executors can run it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    drop = set(positions)
    keep = [i for i in range(t.num_rows) if i not in drop]
    pq.write_table(t.take(pa.array(keep, type=pa.int64())), dst)
    return len(keep)


def compact_position_deletes(
    table_dir: str,
    spark=None,
    timestamp_ms: int = 1_700_000_000_000,
) -> dict:
    """Fold the current snapshot's position-delete files into the data
    files they touch — and ONLY those (VERDICT r6 task #7): work is
    bounded by the delete garbage, not table size, unlike
    ``rewrite_table``/``compact_table``'s full rewrite. Each affected
    file is rewritten without its deleted positions; its manifest entry
    keeps the ORIGINAL data sequence number and snapshot_id, so
    equality-delete scoping (data_seq < delete_seq) and writer-schema
    resolution still apply exactly as before; untouched files are
    carried as EXISTING entries byte-for-byte. All position-delete
    files drop out (their targets no longer exist under the old paths).
    When ``spark`` is given and enough files are affected, the per-file
    rewrites fan out to executors. Returns
    ``{"rewritten": n, "dropped_delete_files": n, "snapshot_id": id}``."""
    import pyarrow.parquet as pq

    meta = current_metadata(table_dir)
    ent = snapshot_entries(table_dir, spark=spark)
    if not ent["pos_deletes"]:
        return {
            "rewritten": 0,
            "dropped_delete_files": 0,
            "snapshot_id": ent["snapshot_id"],
        }
    by_path = {d["path"]: d for d in ent["data"]}
    # delete positions per target file, seq-scoped like the read path
    # (a delete applies to files with data_seq <= delete_seq)
    positions: dict[str, set] = {}
    for p in ent["pos_deletes"]:
        t = pq.read_table(p["path"], columns=["file_path", "pos"])
        for fp, pos in zip(
            t.column("file_path").to_pylist(), t.column("pos").to_pylist()
        ):
            fp = _strip_file_uri(str(fp))
            d = by_path.get(fp)
            if d is not None and d["seq"] <= p["seq"]:
                positions.setdefault(fp, set()).add(int(pos))

    jobs = []
    for src, drop in sorted(positions.items()):
        dst = os.path.join(
            os.path.dirname(src),
            "compact-"
            + hashlib.sha256(src.encode()).hexdigest()[:8]
            + "-"
            + os.path.basename(src),
        )
        jobs.append((src, dst, sorted(drop)))
    if spark is not None and len(jobs) >= 8:
        sc = spark.sparkContext
        sc.parallelize(jobs, min(len(jobs), 256)).map(
            lambda j: _rewrite_file_minus_positions(*j)
        ).collect()
    else:
        for j in jobs:
            _rewrite_file_minus_positions(*j)

    snap = resolve_snapshot(meta)
    md = _meta_dir(table_dir)
    _, manifests = read_container(_strip_file_uri(snap["manifest-list"]))
    parent = meta.get("current-snapshot-id")
    seq = int(meta.get("last-sequence-number", 0)) + 1
    new_snapshot_id = _snapshot_id_for([dst for _, dst, _ in jobs], parent)
    rewritten = {src: dst for src, dst, _ in jobs}
    new_manifests = []
    dropped_deletes = 0
    for mf in manifests:
        content = mf.get("content", 0)
        sid = mf.get("partition_spec_id", 0)
        if content != 0:
            _, dentries = read_container(_strip_file_uri(mf["manifest_path"]))
            is_pos = any(
                e["data_file"].get("content") == CONTENT_POSITION_DELETES
                for e in dentries
                if e["status"] != STATUS_DELETED
            )
            if is_pos:
                dropped_deletes += 1
                continue  # folded in — drop the whole manifest
            new_manifests.append(mf)
            continue
        entries = _live_entries_with_seq(mf)
        touched = [
            e
            for e in entries
            if _strip_file_uri(e["data_file"]["file_path"]) in rewritten
        ]
        if not touched:
            new_manifests.append(mf)  # untouched manifest passes through
            continue
        out_entries = []
        for e in entries:
            src = _strip_file_uri(e["data_file"]["file_path"])
            if src in rewritten:
                dst = rewritten[src]
                e = dict(e)
                df2 = dict(e["data_file"])
                df2["file_path"] = os.path.abspath(dst)
                df2["record_count"] = _parquet_row_count(dst)
                df2["file_size_in_bytes"] = os.path.getsize(dst)
                e["data_file"] = df2
            out_entries.append(e)
        new_manifests.append(
            _write_existing_entries_manifest(
                md,
                out_entries,
                partition_fields(meta, sid),
                sid,
                new_snapshot_id,
                seq,
                salt=mf["manifest_path"],
            )
        )
    new_id = _commit_maintenance_snapshot(
        table_dir,
        meta,
        new_manifests,
        "replace",
        {
            "rewrite-position-deletes": "true",
            "rewritten-data-files": len(jobs),
            "removed-delete-files": dropped_deletes,
        },
        timestamp_ms,
    )
    return {
        "rewritten": len(jobs),
        "dropped_delete_files": dropped_deletes,
        "snapshot_id": new_id,
    }


def expire_snapshots(
    table_dir: str,
    keep_last: int = 1,
    timestamp_ms: int = 1_700_000_000_000,
) -> dict:
    """Expire all but the last ``keep_last`` snapshots and GARBAGE-COLLECT
    every file no kept snapshot references (manifest lists, manifests,
    data and delete parquet) — the spec's snapshot-expiry maintenance,
    the step that actually reclaims space after ``rewrite_table``. Writes
    a new metadata.json version; returns ``{"kept": [...ids],
    "removed_files": n, "removed_bytes": b}``."""
    meta = current_metadata(table_dir)
    snaps = meta.get("snapshots", [])
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    kept = snaps[-keep_last:]
    kept_ids = {s["snapshot-id"] for s in kept}
    if meta.get("current-snapshot-id") not in kept_ids:
        raise ValueError("current snapshot must be kept")

    referenced: set[str] = set()
    for s in kept:
        mlist = _strip_file_uri(s["manifest-list"])
        referenced.add(os.path.abspath(mlist))
        _, manifests = read_container(mlist)
        for mf in manifests:
            mpath = _strip_file_uri(mf["manifest_path"])
            referenced.add(os.path.abspath(mpath))
            _, entries = read_container(mpath)
            for e in entries:
                referenced.add(
                    os.path.abspath(_strip_file_uri(e["data_file"]["file_path"]))
                )

    removed = bytes_removed = 0
    md = _meta_dir(table_dir)
    candidates = glob.glob(os.path.join(md, "snap-*.avro")) + glob.glob(
        os.path.join(md, "m-*.avro")
    ) + glob.glob(
        os.path.join(table_dir, "data", "**", "*.parquet"), recursive=True
    )
    for p in candidates:
        if os.path.abspath(p) not in referenced:
            bytes_removed += os.path.getsize(p)
            os.remove(p)
            removed += 1

    version = (
        max(
            int(os.path.basename(p).split(".")[0][1:])
            for p in glob.glob(os.path.join(md, "v*.metadata.json"))
        )
        + 1
    )
    meta = dict(meta)
    meta["snapshots"] = kept
    meta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", []) if e["snapshot-id"] in kept_ids
    ]
    meta["last-updated-ms"] = timestamp_ms
    with open(os.path.join(md, f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(version))
    return {
        "kept": sorted(kept_ids),
        "removed_files": removed,
        "removed_bytes": bytes_removed,
    }
