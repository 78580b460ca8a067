"""Iceberg partition transforms: identity, bucket[N], truncate[W], days.

Implements the transform semantics of the public Apache Iceberg table
spec (https://iceberg.apache.org/spec/#partition-transforms) so the
pure-Python table layer (``iceberg_meta``) can write and prune
non-identity partition specs — the shapes a real 10^12-file corpus
table uses (``bucket(N, repo)`` to spread hot repos, ``truncate(W,
path)`` prefix grouping, ``days(ts)`` time partitioning).

``bucket[N]`` is ``(murmur3_x86_32(serialize(v)) & Int.MaxValue) % N``
per spec Appendix B ("32-bit Hash Requirements"): ints/longs hash their
8-byte little-endian form (so int 34 and long 34 agree), strings hash
raw UTF-8 bytes, and the spec's published test vectors
(34 -> 2017239379, "iceberg" -> 1210000089) pin the implementation in
``tests/test_iceberg.py``. The murmur3_x86_32 routine itself follows
Austin Appleby's public-domain reference algorithm.

Executor-side bucketing is Arrow-vectorized: fixed-width int/long
values hash as two uint32 blocks in pure numpy (no per-row Python);
variable-width strings hash per UNIQUE value via ``pd.factorize`` —
partition sources are low-cardinality by design, so a batch of 100k
rows typically hashes a few hundred distinct values.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_U32 = np.uint32(0xFFFFFFFF)


def _rotl32(x: np.ndarray | np.uint32, r: int):
    return ((x << np.uint32(r)) | (x >> np.uint32(32 - r))) & _U32


def _fmix32(h):
    h ^= h >> np.uint32(16)
    h = (h * np.uint32(0x85EBCA6B)) & _U32
    h ^= h >> np.uint32(13)
    h = (h * np.uint32(0xC2B2AE35)) & _U32
    h ^= h >> np.uint32(16)
    return h


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 over ``data`` -> SIGNED 32-bit int (Java parity)."""
    with np.errstate(over="ignore"):
        h = np.uint32(seed)
        n = len(data)
        nblocks = n // 4
        if nblocks:
            blocks = np.frombuffer(data, dtype="<u4", count=nblocks)
            for k in blocks:
                k = (np.uint32(k) * _C1) & _U32
                k = _rotl32(k, 15)
                k = (k * _C2) & _U32
                h ^= k
                h = _rotl32(h, 13)
                h = (h * np.uint32(5) + np.uint32(0xE6546B64)) & _U32
        tail = data[nblocks * 4:]
        k1 = np.uint32(0)
        if len(tail) >= 3:
            k1 ^= np.uint32(tail[2]) << np.uint32(16)
        if len(tail) >= 2:
            k1 ^= np.uint32(tail[1]) << np.uint32(8)
        if len(tail) >= 1:
            k1 ^= np.uint32(tail[0])
            k1 = (k1 * _C1) & _U32
            k1 = _rotl32(k1, 15)
            k1 = (k1 * _C2) & _U32
            h ^= k1
        h ^= np.uint32(n)
        h = _fmix32(h)
    return int(np.int32(h))


def _murmur3_32_long_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 of int64 values in their 8-byte
    little-endian form (the spec's int/long serialization) -> int32."""
    with np.errstate(over="ignore"):
        u = v.astype(np.int64).view(np.uint64)
        k1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k2 = (u >> np.uint64(32)).astype(np.uint32)
        h = np.zeros(len(v), dtype=np.uint32)
        for k in (k1, k2):
            k = (k * _C1) & _U32
            k = _rotl32(k, 15)
            k = (k * _C2) & _U32
            h ^= k
            h = _rotl32(h, 13)
            h = (h * np.uint32(5) + np.uint32(0xE6546B64)) & _U32
        h ^= np.uint32(8)
        h = _fmix32(h)
    return h.view(np.int32)


def _hash_series(s: pd.Series, iceberg_type: str) -> np.ndarray:
    """murmur3_x86_32 of each non-null value per the spec's per-type
    serialization -> int32 ndarray (nulls undefined — mask first)."""
    if iceberg_type in ("int", "long"):
        return _murmur3_32_long_vec(
            pd.to_numeric(s, errors="raise").to_numpy(dtype=np.int64)
        )
    if iceberg_type == "string":
        codes, uniques = pd.factorize(s, use_na_sentinel=False)
        uh = np.fromiter(
            (murmur3_32(str(u).encode("utf-8")) for u in uniques),
            dtype=np.int32,
            count=len(uniques),
        )
        return uh[codes]
    raise NotImplementedError(f"bucket over iceberg type {iceberg_type!r}")


def bucket_value(v, n: int, iceberg_type: str):
    """Driver-side single-value bucket (filter transformation)."""
    if v is None:
        return None
    return int(_hash_series(pd.Series([v]), iceberg_type)[0] & 0x7FFFFFFF) % n


def bucket_series(s: pd.Series, n: int, iceberg_type: str) -> pd.Series:
    out = pd.Series(np.zeros(len(s), dtype="float64"), index=s.index)
    mask = s.notna()
    if mask.any():
        h = _hash_series(s[mask], iceberg_type)
        out[mask] = (h.view(np.uint32) & np.uint32(0x7FFFFFFF)) % np.uint32(n)
    out[~mask] = np.nan
    return out.astype("Int32").astype(object).where(mask, None)


# --------------------------------------------------------------------------
# transform parsing / application
# --------------------------------------------------------------------------

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")


_TIME_KINDS = {
    "day": "days", "days": "days",
    "year": "years", "years": "years",
    "month": "months", "months": "months",
    "hour": "hours", "hours": "hours",
}


def parse_transform(txt: str) -> tuple[str, int | None]:
    """Iceberg JSON transform string -> (kind, param)."""
    if txt == "identity":
        return "identity", None
    if txt in _TIME_KINDS:
        return _TIME_KINDS[txt], None
    m = _BUCKET_RE.match(txt)
    if m:
        return "bucket", int(m.group(1))
    m = _TRUNC_RE.match(txt)
    if m:
        return "truncate", int(m.group(1))
    raise NotImplementedError(
        f"partition transform {txt!r} "
        "(identity/bucket[N]/truncate[W]/years/months/days/hours)"
    )


_TIME_SINGULAR = {"years": "year", "months": "month", "days": "day", "hours": "hour"}


def transform_str(kind: str, param: int | None) -> str:
    if kind == "identity":
        return "identity"
    if kind in _TIME_SINGULAR:
        return _TIME_SINGULAR[kind]  # spec JSON serializes the singular form
    return f"{kind}[{param}]"


def default_field_name(kind: str, param: int | None, source: str) -> str:
    """Java Iceberg's default partition-field names."""
    if kind == "identity":
        return source
    if kind == "bucket":
        return f"{source}_bucket"
    if kind == "truncate":
        return f"{source}_trunc"
    if kind in _TIME_SINGULAR:
        return f"{source}_{_TIME_SINGULAR[kind]}"
    raise NotImplementedError(kind)


def result_type(kind: str, source_type: str) -> str:
    """Iceberg type of the transform RESULT (partition tuple / bounds)."""
    if kind == "identity":
        return source_type
    if kind == "bucket":
        return "int"
    if kind == "truncate":
        return source_type
    if kind in _TIME_SINGULAR:
        return "int"  # ordinals from epoch (spec result types date/int)
    raise NotImplementedError(kind)


def transform_value(kind: str, param: int | None, v, source_type: str):
    """Apply a transform to ONE source value (driver-side: filter
    rewriting, hive-dir coercion checks). Mirrors the executor-side
    column exprs below exactly."""
    if v is None:
        return None
    if kind == "identity":
        return v
    if kind == "bucket":
        return bucket_value(v, param, source_type)
    if kind == "truncate":
        if source_type in ("int", "long"):
            v = int(v)
            return v - (((v % param) + param) % param)
        if source_type == "string":
            return str(v)[:param]
        raise NotImplementedError(f"truncate over {source_type!r}")
    if kind in _TIME_SINGULAR:
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            d, hh = v.date(), v.hour
        elif isinstance(v, _dt.date):
            d, hh = v, 0
        else:
            raise NotImplementedError(f"{kind} over {type(v).__name__}")
        if kind == "years":
            return d.year - 1970
        if kind == "months":
            return (d.year - 1970) * 12 + (d.month - 1)
        epoch_days = (d - _dt.date(1970, 1, 1)).days
        if kind == "days":
            return epoch_days
        return epoch_days * 24 + hh  # hours
    raise NotImplementedError(kind)


def transform_column(kind: str, param: int | None, source: str, source_type: str):
    """Spark Column computing the transform of ``source`` — JVM
    expressions for identity/truncate/days, the vectorized murmur3
    pandas UDF for bucket."""
    from pyspark.sql import functions as F

    if kind == "identity":
        return F.col(source)
    if kind == "truncate":
        if source_type in ("int", "long"):
            # floored modulus: Spark pmod keeps the sign of the divisor
            return (
                F.col(source) - F.pmod(F.col(source), F.lit(param))
            ).cast("long" if source_type == "long" else "int")
        if source_type == "string":
            return F.substring(F.col(source), 1, param)
        raise NotImplementedError(f"truncate over {source_type!r}")
    if kind in _TIME_SINGULAR:
        # composed from calendar fields, never session-timezone epoch
        # math, so TIMESTAMP_NTZ sources transform identically on any
        # cluster TZ (and identically to the driver-side transform_value)
        if kind == "years":
            return (F.year(source) - F.lit(1970)).cast("int")
        if kind == "months":
            return (
                (F.year(source) - F.lit(1970)) * F.lit(12)
                + F.month(source) - F.lit(1)
            ).cast("int")
        epoch_days = F.datediff(F.col(source).cast("date"), F.lit("1970-01-01"))
        if kind == "days":
            return epoch_days.cast("int")
        return (epoch_days * F.lit(24) + F.hour(source)).cast("int")  # hours
    if kind == "bucket":
        from pyspark.sql.functions import pandas_udf

        n, styp = param, source_type

        @pandas_udf("int")
        def _bucket(s: pd.Series) -> pd.Series:
            return bucket_series(s, n, styp)

        return _bucket(F.col(source))
    raise NotImplementedError(kind)


def parse_partition_by(spec: str) -> tuple[str, str, int | None]:
    """User-facing partition_by element -> (source_col, kind, param).

    Accepts ``"repo"`` (identity), ``"bucket(4, repo)"``,
    ``"truncate(3, path)"``, ``"days(ts)"``.
    """
    spec = spec.strip()
    m = re.match(r"^bucket\(\s*(\d+)\s*,\s*(\w+)\s*\)$", spec)
    if m:
        return m.group(2), "bucket", int(m.group(1))
    m = re.match(r"^truncate\(\s*(\d+)\s*,\s*(\w+)\s*\)$", spec)
    if m:
        return m.group(2), "truncate", int(m.group(1))
    m = re.match(r"^(years?|months?|days?|hours?)\(\s*(\w+)\s*\)$", spec)
    if m:
        return m.group(2), _TIME_KINDS[m.group(1)], None
    if re.match(r"^\w+$", spec):
        return spec, "identity", None
    raise ValueError(f"unparseable partition_by element {spec!r}")
