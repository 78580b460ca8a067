"""Posting-list codec: sorted docIDs -> delta + varint bytes, plus
block-max skip metadata. All numpy-vectorized — this code runs inside
Arrow kernels on executors, never per-row Python.

This fills the role the reference's Huffman compressor plays (shrink the
payload; reference: app/services/huffman.py:26-102) with the standard
inverted-index scheme the north_star names: gaps of sorted docIDs are
small, varint makes them 1-2 bytes instead of 8.

docIDs are signed int64 (xxhash64-derived, may be negative). We map them
to uint64 by flipping the sign bit, which makes unsigned order == signed
order, so gaps are well-defined and non-negative.

Edge cases (the analog of the reference Huffman's crash cases, noted in
SURVEY.md §2.8): empty lists never occur (df >= 1 by construction) but
encode/decode handle them anyway; a single-posting list is one varint
whose gap is the (sign-flipped) docID itself.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_SIGN = np.uint64(1 << 63)
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def to_unsigned(ids: np.ndarray) -> np.ndarray:
    """Signed int64 -> order-preserving uint64 (flip sign bit)."""
    return ids.astype(np.int64).view(np.uint64) ^ _SIGN


def to_signed(u: np.ndarray) -> np.ndarray:
    return (u ^ _SIGN).view(np.int64)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style varint encode of a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += (v >= t).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(nb)[:-1]])
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of varint_encode -> uint64 array (vectorized reduceat)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (arr & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group = np.cumsum(np.concatenate([[False], is_end[:-1]]))
    within = (np.arange(arr.size) - starts[group]).astype(np.uint64)
    contrib = (arr & 0x7F).astype(np.uint64) << (np.uint64(7) * within)
    return np.add.reduceat(contrib, starts)


def encode_postings(doc_ids: np.ndarray, weights: np.ndarray, presorted: bool = False):
    """Encode one term's (sub-)posting list.

    doc_ids: signed int64 (any order); weights: float64 aligned with ids.
    Returns (postings_bytes, weights_bytes, block_last, block_max,
    block_off, n):
      postings_bytes — varint(first_u, gap, gap, ...)
      weights_bytes  — float64 LE, sorted-docID order
      block_last     — last signed docID per BLOCK_SIZE block (skip index)
      block_max      — max weight per block (block-max metadata; the
                       query-time upper bound is idf * block_max)
      block_off      — byte offset of each block's first varint in
                       postings_bytes. Together with block_last this makes
                       every block INDEPENDENTLY decodable (the gap base
                       of block i is block_last[i-1]), which is what lets
                       the query kernel skip decoding non-qualifying
                       blocks entirely — for a stop-like term at corpus
                       scale, eager decode IS the query cost.
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float64)
    if not presorted:
        # sign-flip order == signed order, so sorting unsigned keys equals
        # a plain signed sort; presorted=True lets Tungsten-sorted input
        # (ORDER BY doc_id) skip this.
        order = np.argsort(to_unsigned(ids), kind="stable")
        ids, w = ids[order], w[order]
    u = to_unsigned(ids)
    gaps = np.empty_like(u)
    if u.size:
        gaps[0] = u[0]
        gaps[1:] = u[1:] - u[:-1]
    n_blocks = (u.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last = [int(ids[min((i + 1) * BLOCK_SIZE, u.size) - 1]) for i in range(n_blocks)]
    block_max = [float(w[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE].max()) for i in range(n_blocks)]
    if n_blocks:
        nb = np.ones(gaps.size, dtype=np.int64)
        for t in _THRESHOLDS:
            nb += (gaps >= t).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
        block_off = [int(starts[i * BLOCK_SIZE]) for i in range(n_blocks)]
    else:
        block_off = []
    return varint_encode(gaps), w.tobytes(), block_last, block_max, block_off, int(u.size)


def decode_postings(postings_bytes: bytes, weights_bytes: bytes):
    """-> (signed int64 docIDs ascending-unsigned order, float64 weights)."""
    gaps = varint_decode(postings_bytes)
    u = np.cumsum(gaps, dtype=np.uint64)
    return to_signed(u), np.frombuffer(weights_bytes, dtype=np.float64)


def decode_block(
    postings_bytes: bytes,
    weights_bytes: bytes,
    block_last: np.ndarray,
    block_off: np.ndarray,
    i: int,
):
    """Decode ONLY block ``i`` -> (ids, w). Reads just that block's byte
    slice; the gap base is block_last[i-1] (or 0 for the first block)."""
    lo = int(block_off[i])
    hi = int(block_off[i + 1]) if i + 1 < len(block_off) else len(postings_bytes)
    gaps = varint_decode(postings_bytes[lo:hi])
    base = (
        to_unsigned(np.asarray([block_last[i - 1]], dtype=np.int64))[0]
        if i > 0
        else np.uint64(0)
    )
    u = base + np.cumsum(gaps, dtype=np.uint64)
    w = np.frombuffer(
        weights_bytes, dtype=np.float64, count=gaps.size, offset=i * BLOCK_SIZE * 8
    )
    return to_signed(u), w


def merge_encoded_runs(runs: list[tuple[bytes, bytes]]):
    """Merge several encoded sub-runs of ONE term (disjoint docID sets,
    e.g. per-salt partials) into a single encoded list."""
    ids_parts, w_parts = [], []
    for pb, wb in runs:
        i, w = decode_postings(pb, wb)
        ids_parts.append(i)
        w_parts.append(w)
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    w = np.concatenate(w_parts) if w_parts else np.empty(0, np.float64)
    return encode_postings(ids, w)
