"""Minimal Apache Avro Object Container File codec — pure stdlib.

Why this exists: the north-rule input format is an Iceberg table, whose
metadata layer (manifest lists and manifests) is Avro. This sandbox has
no network (``curl https://repo1.maven.org`` -> could not resolve host,
attempt recorded in FIXTURES.md), so neither the
``iceberg-spark-runtime`` jar nor ``fastavro`` can be installed. Like
the PNG/WAV/AVI codecs in ``tfidf_spark/functions``, the format is
implemented directly from the PUBLIC spec (Apache Avro 1.11
specification, "Object Container Files" + "Binary Encoding"): this is a
from-scratch implementation, not a port of any Avro library.

Scope — exactly what Iceberg metadata needs, generically:
- types: null, boolean, int, long (zigzag varint), float, double,
  bytes, string, fixed, enum, array, map, union, record, plus named-type
  references;
- container framing: ``Obj\\x01`` magic, file-metadata map with
  ``avro.schema``/``avro.codec``, 16-byte sync marker, counted blocks;
- codecs: ``null`` and ``deflate`` (raw DEFLATE per the spec) on read,
  ``null`` on write.

The decoder is driven by the WRITER schema embedded in the file header,
so manifests written by real Iceberg/Java decode too (logical types are
surfaced as their underlying primitive, which is all the table loader
needs). Records decode to plain dicts; the encoder takes dicts and a
schema. Deterministic output: no randomness — the sync marker is a
caller-supplied or content-derived digest.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive binary encoding
# --------------------------------------------------------------------------

def write_long(buf: io.BytesIO, n: int) -> None:
    """Variable-length zigzag (spec: int and long share this encoding)."""
    u = (n << 1) ^ (n >> 63)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    u = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def read_bytes(buf: io.BufferedIOBase) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# --------------------------------------------------------------------------
# schema-driven generic codec
# --------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class _Names:
    """Registry of named types (record/enum/fixed) for by-name reuse."""

    def __init__(self):
        self.types: dict[str, dict] = {}

    def register(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            self.types[name] = schema
            ns = schema.get("namespace")
            if ns:
                self.types[f"{ns}.{name}"] = schema

    def resolve(self, ref: str) -> dict | str:
        if ref in _PRIMITIVES:
            return ref
        if ref in self.types:
            return self.types[ref]
        raise ValueError(f"unknown Avro type reference: {ref!r}")


def _decode(schema, buf: io.BufferedIOBase, names: _Names):
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            schema = names.resolve(schema)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return buf.read(1) == b"\x01"
        if schema in ("int", "long"):
            return read_long(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return read_bytes(buf)
        if schema == "string":
            return read_bytes(buf).decode("utf-8")
        raise ValueError(f"unhandled primitive {schema!r}")
    if isinstance(schema, list):  # union: long index + value
        idx = read_long(buf)
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t in _PRIMITIVES or isinstance(t, (dict, list)):
        # {"type": "string", "logicalType": ...} or nested definition
        return _decode(t, buf, names)
    if t == "record":
        names.register(schema)
        return {
            f["name"]: _decode(f["type"], buf, names) for f in schema["fields"]
        }
    if t == "enum":
        names.register(schema)
        return schema["symbols"][read_long(buf)]
    if t == "fixed":
        names.register(schema)
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:
                read_long(buf)  # block byte size — skippable, unused
                count = -count
            for _ in range(count):
                out.append(_decode(schema["items"], buf, names))
    if t == "map":
        out = {}
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:
                read_long(buf)
                count = -count
            for _ in range(count):
                key = read_bytes(buf).decode("utf-8")
                out[key] = _decode(schema["values"], buf, names)
    raise ValueError(f"unhandled Avro type {t!r}")


def _union_branch(schema_list: list, value) -> int:
    """Pick the union branch for a Python value (null vs the one other
    branch covers everything Iceberg metadata uses)."""
    for i, s in enumerate(schema_list):
        if (s == "null" or (isinstance(s, dict) and s.get("type") == "null")):
            if value is None:
                return i
        elif value is not None:
            return i
    raise ValueError(f"no union branch for {value!r} in {schema_list!r}")


def _encode(schema, value, buf: io.BytesIO, names: _Names) -> None:
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            schema = names.resolve(schema)
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            buf.write(b"\x01" if value else b"\x00")
            return
        if schema in ("int", "long"):
            write_long(buf, int(value))
            return
        if schema == "float":
            buf.write(struct.pack("<f", float(value)))
            return
        if schema == "double":
            buf.write(struct.pack("<d", float(value)))
            return
        if schema == "bytes":
            write_bytes(buf, bytes(value))
            return
        if schema == "string":
            write_bytes(buf, value.encode("utf-8"))
            return
        raise ValueError(f"unhandled primitive {schema!r}")
    if isinstance(schema, list):
        idx = _union_branch(schema, value)
        write_long(buf, idx)
        _encode(schema[idx], value, buf, names)
        return
    t = schema["type"]
    if t in _PRIMITIVES or isinstance(t, (dict, list)):
        _encode(t, value, buf, names)
        return
    if t == "record":
        names.register(schema)
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), buf, names)
        return
    if t == "enum":
        names.register(schema)
        write_long(buf, schema["symbols"].index(value))
        return
    if t == "fixed":
        names.register(schema)
        assert len(value) == schema["size"]
        buf.write(value)
        return
    if t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                _encode(schema["items"], item, buf, names)
        write_long(buf, 0)
        return
    if t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, k.encode("utf-8"))
                _encode(schema["values"], v, buf, names)
        write_long(buf, 0)
        return
    raise ValueError(f"unhandled Avro type {t!r}")


# --------------------------------------------------------------------------
# container files
# --------------------------------------------------------------------------

def read_container(path: str) -> tuple[dict | list | str, list]:
    """Read an Avro Object Container File -> (writer_schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    names = _Names()
    meta = _decode({"type": "map", "values": "bytes"}, buf, names)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        block = read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        bbuf = io.BytesIO(block)
        block_names = _Names()
        for _ in range(count):
            records.append(_decode(schema, bbuf, block_names))
    return schema, records


def write_container(
    path: str, schema: dict, records: list, extra_meta: dict[str, bytes] | None = None
) -> None:
    """Write records as a single-block Avro container (codec null).

    The sync marker is derived from the content (md5 of schema+payload),
    keeping output byte-deterministic for identical inputs."""
    schema_json = json.dumps(schema, separators=(",", ":"))
    payload = io.BytesIO()
    names = _Names()
    for rec in records:
        _encode(schema, rec, payload, names)
    body = payload.getvalue()
    sync = hashlib.md5(schema_json.encode() + body).digest()

    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"), "avro.codec": b"null"}
    for k, v in (extra_meta or {}).items():
        meta[k] = v
    _encode({"type": "map", "values": "bytes"}, meta, buf, _Names())
    buf.write(sync)
    write_long(buf, len(records))
    write_bytes(buf, body)
    buf.write(sync)
    with open(path, "wb") as f:
        f.write(buf.getvalue())
