"""Huffman transfer-codec tests: roundtrip properties, optimality (the
Huffman total cost is unique across all optimal trees, so we cross-check
against an independent reference-style heapq implementation), reference
bit-packing parity, and the edge cases the reference crashes on."""

from __future__ import annotations

import heapq
from collections import Counter

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tfidf_spark.functions.transfer import (
    huffman_decode,
    huffman_encode,
    huffman_transfer_udf,
)


def _reference_style_cost(data: bytes) -> int:
    """Total encoded bits per the reference's tree construction
    (app/services/huffman.py:26-60), built independently here."""
    freq = Counter(data)
    if len(freq) == 1:
        return len(data)  # our documented 1-bit single-symbol code
    heap: list[tuple[int, int, int]] = []
    for i, (sym, f) in enumerate(freq.items()):
        heap.append((f, i, 0))
    heapq.heapify(heap)
    # Huffman cost = sum of all internal-node frequencies
    cost = 0
    n = len(heap)
    counter = n
    while len(heap) > 1:
        fa, _, _ = heapq.heappop(heap)
        fb, _, _ = heapq.heappop(heap)
        cost += fa + fb
        heapq.heappush(heap, (fa + fb, counter, 0))
        counter += 1
    return cost


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2000))
def test_roundtrip_property(data):
    enc, codes, pad = huffman_encode(data)
    assert huffman_decode(enc, codes, pad) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=2, max_size=2000))
def test_optimal_cost_matches_reference_tree(data):
    if len(set(data)) < 2:
        return
    enc, codes, pad = huffman_encode(data)
    total_bits = len(enc) * 8 - pad
    assert total_bits == _reference_style_cost(data)


def test_codes_are_prefix_free():
    data = b"abracadabra banana bandana" * 3
    _, codes, _ = huffman_encode(data)
    bitstrings = list(codes.values())
    for i, a in enumerate(bitstrings):
        for j, b in enumerate(bitstrings):
            if i != j:
                assert not b.startswith(a)


def test_bit_packing_matches_reference_convention():
    """Big-endian packing with zero padding — byte-for-byte what the
    reference's int(bitstring, 2).to_bytes(n, 'big') produces for the
    same code table."""
    data = b"aab"
    enc, codes, pad = huffman_encode(data)
    bitstring = "".join(codes[b] for b in data) + "0" * pad
    expect = int(bitstring, 2).to_bytes(len(bitstring) // 8, "big")
    assert enc == expect


def test_edge_empty_input():
    # the reference raises IndexError on heap[0] for empty input
    assert huffman_encode(b"") == (b"", {}, 0)
    assert huffman_decode(b"", {}, 0) == b""


def test_edge_single_symbol():
    # the reference emits a zero-length code and crashes packing
    enc, codes, pad = huffman_encode(b"aaaa")
    assert codes == {ord("a"): "0"}
    assert huffman_decode(enc, codes, pad) == b"aaaa"


def test_compresses_skewed_text():
    data = (b"e" * 900 + b"xyzq" * 25) * 4
    enc, _, _ = huffman_encode(data)
    assert len(enc) < len(data) / 2


def test_decoder_handles_noncanonical_reference_tables():
    """The decoder must accept ANY prefix-free table (the reference's
    tie-order-dependent codes), not just our canonical ones."""
    codes = {ord("a"): "11", ord("b"): "10", ord("c"): "0"}  # non-canonical
    bitstring = "11" + "0" + "10" + "11"  # a c b a
    pad = (8 - len(bitstring) % 8) % 8
    enc = int(bitstring + "0" * pad, 2).to_bytes((len(bitstring) + pad) // 8, "big")
    assert huffman_decode(enc, codes, pad) == b"acba"


def test_udf_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = docs.select(
        "doc_id", huffman_transfer_udf()("text").alias("h")
    ).select("doc_id", "h.*").collect()
    assert len(out) == 50
    for r in out:
        if r["orig_bytes"] > 64:
            assert 0 < r["encoded_bytes"] < r["orig_bytes"]
