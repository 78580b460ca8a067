"""Huffman transfer compression — the reference's document-download
codec (reference app/services/huffman.py:26-102, endpoint
app/controllers/document.py:254-319) re-done engine-side.

Semantics preserved:
- per-document byte-level Huffman tree from the document's own byte
  frequencies;
- bitstring padded with zeros to a byte boundary, packed BIG-endian
  (the reference's ``int(bitstring, 2).to_bytes(..., 'big')``);
- returns (encoded, codes, padding) like ``huffman_encode_async``.

Documented deviations (SURVEY.md §2.8 edge cases):
- DETERMINISTIC canonical codes: the reference breaks heap ties by
  insertion order, so equal-frequency symbols can get different (equally
  optimal) codes between runs. We assign canonical codes in
  (length, symbol) order — same optimal total bit count (the Huffman
  cost Σ freq·len is unique across all optimal trees), reproducible
  across executors/runs, and the code table is smaller to ship (lengths
  suffice).
- Defined edge cases where the reference crashes: empty input ->
  (b"", {}, 0); single distinct symbol -> 1-bit code "0".
- A decoder is provided (the reference ships none — its clients must
  reimplement one from the JSON code table).

The per-byte hot path is numpy-vectorized (bit scatter + packbits), so
the pandas UDF form stays Arrow-batch friendly.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def _code_lengths(freq: np.ndarray) -> np.ndarray:
    """Huffman code length per symbol (0 for absent symbols).

    Standard heapq construction; ties broken by smallest contained
    symbol so the result is deterministic. Single-symbol input gets
    length 1 (the reference would emit an empty code and crash packing).
    """
    present = np.flatnonzero(freq)
    lengths = np.zeros(256, dtype=np.int64)
    if present.size == 0:
        return lengths
    if present.size == 1:
        lengths[present[0]] = 1
        return lengths
    heap = [(int(freq[s]), int(s), [int(s)]) for s in present]
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, ta, syms_a = heapq.heappop(heap)
        fb, tb, syms_b = heapq.heappop(heap)
        for s in syms_a:
            lengths[s] += 1
        for s in syms_b:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, min(ta, tb), syms_a + syms_b))
    return lengths


def _canonical_codes(lengths: np.ndarray) -> tuple[np.ndarray, dict[int, str]]:
    """Canonical code assignment: symbols sorted by (length, symbol) get
    consecutive codes, left-shifted at each length increase. Returns
    (codes int64 per symbol, {symbol: bitstring})."""
    codes = np.zeros(256, dtype=np.int64)
    table: dict[int, str] = {}
    order = sorted(np.flatnonzero(lengths), key=lambda s: (lengths[s], s))
    code = 0
    prev_len = 0
    for s in order:
        ln = int(lengths[s])
        code <<= ln - prev_len
        codes[s] = code
        table[int(s)] = format(code, f"0{ln}b")
        code += 1
        prev_len = ln
    return codes, table


def huffman_encode(data: bytes) -> tuple[bytes, dict[int, str], int]:
    """-> (encoded_bytes, {symbol_byte: bitstring}, padding_bits)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size == 0:
        return b"", {}, 0
    freq = np.bincount(arr, minlength=256)
    lengths = _code_lengths(freq)
    codes, table = _canonical_codes(lengths)

    lens = lengths[arr]
    cs = codes[arr]
    total_bits = int(lens.sum())
    padding = (8 - total_bits % 8) % 8
    bits = np.zeros(total_bits + padding, dtype=np.uint8)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # scatter code bits MSB-first: ≤ max-code-length passes, all vector
    for j in range(int(lens.max())):
        m = lens > j
        bits[offsets[m] + j] = (cs[m] >> (lens[m] - 1 - j)) & 1
    return np.packbits(bits).tobytes(), table, padding


def huffman_decode(
    encoded: bytes, codes: dict[int, str], padding: int
) -> bytes:
    """Inverse of huffman_encode (also decodes reference-produced
    payloads — any prefix-free table works, not just canonical)."""
    if not codes:
        return b""
    bits = np.unpackbits(np.frombuffer(encoded, dtype=np.uint8))
    if padding:
        bits = bits[: bits.size - padding]
    by_len: dict[int, dict[int, int]] = {}
    for sym, bstr in codes.items():
        by_len.setdefault(len(bstr), {})[int(bstr, 2)] = sym
    out = bytearray()
    cur = 0
    cur_len = 0
    for b in bits.tolist():
        cur = (cur << 1) | b
        cur_len += 1
        if cur_len in by_len:
            sym = by_len[cur_len].get(cur)
            if sym is not None:
                out.append(sym)
                cur = 0
                cur_len = 0
    if cur_len:
        raise ValueError("dangling bits do not form a code word")
    return bytes(out)


def huffman_roundtrip_udf():
    """Arrow-vectorized ``content -> struct(orig_bytes, encoded_bytes,
    padding, roundtrip_sha256)`` — encode THEN decode executor-side and
    emit the sha256 of the decoded bytes. Against an oracle's
    ``(strlen(text), sha256(text))`` this proves the codec is lossless on
    every real document (the driver's hash gate); compression ratio and
    bit-level parity with a reference-style tree are proven separately in
    tests/test_transfer.py."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "orig_bytes long, encoded_bytes long, padding int, "
        "roundtrip_sha256 string"
    )
    def _rt(s: pd.Series) -> pd.DataFrame:
        rows = []
        for text in s.fillna(""):
            data = text.encode("utf-8")
            enc, codes, pad = huffman_encode(data)
            dec = huffman_decode(enc, codes, pad)
            rows.append(
                (len(data), len(enc), pad, hashlib.sha256(dec).hexdigest())
            )
        return pd.DataFrame(
            rows,
            columns=[
                "orig_bytes", "encoded_bytes", "padding", "roundtrip_sha256",
            ],
        )

    return _rt


def huffman_transfer_udf():
    """Arrow-vectorized ``content -> struct(encoded binary, padding int,
    orig_bytes long, encoded_bytes long)`` — the transfer-compression
    shape of the reference's GET /documents/{id}/huffman response,
    computed executor-side per Arrow batch (the code table is canonical,
    so the receiver rebuilds it from code lengths; ship `codes` via
    huffman_encode directly when the JSON table is required).

    NOTE: pandas must be imported at module level — with ``from
    __future__ import annotations`` the UDF type hints are strings that
    pyspark resolves against MODULE globals; a function-local ``pd``
    import silently breaks hint resolution."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "encoded binary, padding int, orig_bytes long, encoded_bytes long"
    )
    def _enc(s: pd.Series) -> pd.DataFrame:
        rows = []
        for text in s.fillna(""):
            data = text.encode("utf-8")
            enc, _, pad = huffman_encode(data)
            rows.append((enc, pad, len(data), len(enc)))
        return pd.DataFrame(
            rows, columns=["encoded", "padding", "orig_bytes", "encoded_bytes"]
        )

    return _enc
