"""Pure-stdlib PNG/WAV codec: encode->decode roundtrips, independent
forward-filter constructions proving every defilter (Sub/Up/Average/
Paeth), palette expansion, corruption detection, and the end-to-end
Spark path (synth_media real payloads -> StdlibCodec decode)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tfidf_spark.functions.wav import wav_decode, wav_encode
from tfidf_spark.functions.png import (
    _MAGIC,
    _chunk,
    png_decode,
    png_encode,
)


def _rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(5, 9), (8, 8, 3), (3, 4, 4), (1, 1, 3)])
def test_roundtrip(shape):
    img = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def _filter_forward(img: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG filter the ENCODER way (per spec, independent of the
    decoder's inverse) and build a valid PNG whose rows all use it."""
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]])
        ul = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = (cur - left) & 0xFF
        elif ftype == 2:
            filt = (cur - prev) & 0xFF
        elif ftype == 3:
            filt = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            filt = (cur - pred) & 0xFF
        out.append(ftype)
        out += filt.astype(np.uint8).tobytes()
        prev = cur
    color_type = {1: 0, 2: 4, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("nch", [1, 2, 4])
def test_defilter_inverts_spec_filters(ftype, nch):
    img = _rng().integers(0, 256, size=(7, 11, nch), dtype=np.uint8)
    got = png_decode(_filter_forward(img, ftype))
    want = img[:, :, 0] if nch == 1 else img
    assert np.array_equal(got, want), f"filter {ftype} nch {nch}"


def test_palette_expansion():
    pal = _rng().integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = _rng().integers(0, 4, size=(6, 5, 1), dtype=np.uint8)
    h, w = 6, 5
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += idx[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    data = (_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    assert np.array_equal(png_decode(data), pal[idx[:, :, 0]])


def test_corruption_detected():
    img = _rng().integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = bytearray(png_encode(img))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a" + bytes(good))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with pytest.raises(ValueError, match="CRC|truncated|IDAT"):
        png_decode(bytes(bad))
    # interlaced flag -> explicit unsupported error
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    data = (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\0" * 52)) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(data)


def test_wav_roundtrip():
    s = (_rng().standard_normal(1600) * 0.3).astype(np.float32)
    got = wav_decode(wav_encode(s))
    assert got.dtype == np.float32 and got.size == 1600
    # truncation + 32767/32768 scale asymmetry -> <= ~2 LSB
    assert np.max(np.abs(got - np.clip(s, -1, 1))) < 2 / 32767


def test_stdlib_codec_end_to_end(spark):
    """synth_media emits REAL PNG/WAV payloads; StdlibCodec recovers the
    exact pixels/samples through the Spark pipeline."""
    from tfidf_spark.operators.multimodal import (
        StdlibCodec,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 12).cache()
    rows = media.filter("kind = 'image'").collect()
    assert rows
    codec = StdlibCodec()
    for r in rows:
        px = codec.decode_image(bytes(r["payload"]))
        rng = np.random.default_rng([42, r["media_id"]])
        want = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        assert np.array_equal(px, want)
    arow = media.filter("kind = 'audio'").collect()[0]
    samples = codec.decode_audio(bytes(arow["payload"]))
    assert samples.size == 1600
    # features over the REAL decodes, partition-independent
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"]
          for r in extract_features(media.repartition(4)).collect()}
    assert len(f1) == 12 and all(len(v) == 64 for v in f1.values())
    for k in f1:
        assert np.allclose(f1[k], f2[k])
