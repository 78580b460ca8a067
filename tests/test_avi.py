"""Pure-stdlib AVI mux/demux: roundtrip fidelity, sampling cadence,
byte-skipping demux, malformed-input detection, and the e2e Spark path
through extract_features (real video payloads from synth_media)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tfidf_spark.functions.avi import avi_encode, avi_info, avi_sample_frames


def _frames(n, h=6, w=5, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_roundtrip_every_frame():
    frames = _frames(5)
    data = avi_encode(frames, fps=10)
    got = avi_sample_frames(data, every_ms=0)  # step clamps to 1 -> all
    assert len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_header_fields():
    data = avi_encode(_frames(8, h=6, w=5), fps=4)
    info = avi_info(data)
    assert info == {
        "usec_per_frame": 250_000, "n_frames": 8, "width": 5, "height": 6
    }


def test_sampling_cadence():
    frames = _frames(10)
    data = avi_encode(frames, fps=10)  # 100ms per frame
    got = avi_sample_frames(data, every_ms=300)  # every 3rd frame
    assert len(got) == 4  # frames 0, 3, 6, 9
    for i, f in zip([0, 3, 6, 9], got):
        assert np.array_equal(frames[i], f)


def test_odd_width_stride_padding():
    frames = _frames(3, h=4, w=3)  # 3*3=9 bytes/row -> stride 12
    got = avi_sample_frames(avi_encode(frames, fps=5), every_ms=0)
    assert all(np.array_equal(a, b) for a, b in zip(frames, got))


def test_rejects_non_avi_and_truncation():
    with pytest.raises(ValueError, match="not a RIFF AVI"):
        avi_sample_frames(b"\x89PNG not an avi at all", 1000)
    data = bytearray(avi_encode(_frames(3), fps=5))
    # corrupt the strf bitcount to 32 -> decoder must refuse
    idx = data.find(b"strf")
    struct.pack_into("<H", data, idx + 8 + 14, 32)
    with pytest.raises(ValueError, match="24-bit"):
        avi_sample_frames(bytes(data), 1000)


def test_compressed_handler_routed_to_quarantine():
    data = bytearray(avi_encode(_frames(2), fps=5))
    idx = data.find(b"vids")
    data[idx + 4: idx + 8] = b"h264"
    with pytest.raises(ValueError, match="DIB"):
        avi_info(bytes(data))


def test_e2e_video_features_through_spark(spark):
    from tfidf_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, n_rows=12)
    feats = extract_features(media).filter("kind = 'video'").collect()
    assert len(feats) == 4  # ids 2,5,8,11
    assert all(len(r["feature"]) == 64 for r in feats)
    # deterministic across partitionings (real decode, seeded projection)
    again = extract_features(synth_media(spark, n_rows=12).repartition(5))
    a = {r["media_id"]: r["feature"] for r in feats}
    b = {
        r["media_id"]: r["feature"]
        for r in again.filter("kind = 'video'").collect()
    }
    assert a == b


# ------------------------------------------------------------ properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 6),
    h=st.integers(1, 16),
    w=st.integers(1, 16),  # odd widths exercise stride padding
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_property(n, h, w, fps, seed):
    """Any frame shape / count / rate roundtrips bit-exactly, and the
    header reports the real geometry."""
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]
    data = avi_encode(frames, fps=fps)
    info = avi_info(data)
    assert (info["n_frames"], info["width"], info["height"]) == (n, w, h)
    got = avi_sample_frames(data, every_ms=0)
    assert len(got) == n
    assert all(np.array_equal(a, b) for a, b in zip(frames, got))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 12),
    fps=st.integers(1, 30),
    every_ms=st.integers(1, 3000),
)
def test_avi_sampling_selects_every_kth(n, fps, every_ms):
    """The sampler returns exactly frames 0, k, 2k, ... where
    k = max(1, round(every_ms / frame_duration_ms))."""
    frames = _frames(n, h=3, w=3, seed=n)
    data = avi_encode(frames, fps=fps)
    got = avi_sample_frames(data, every_ms=every_ms)
    k = max(1, round(every_ms * 1000 / (1_000_000 // fps)))
    want_idx = list(range(0, n, k))
    assert len(got) == len(want_idx)
    assert all(np.array_equal(frames[i], g) for i, g in zip(want_idx, got))
