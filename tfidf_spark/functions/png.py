"""Pure-stdlib PNG codec (zlib + struct + numpy): enough of RFC 2083 to
make the multimodal image path REAL in a container with no Pillow/opencv.

Decoder supports the formats a training-data pipeline actually meets in
bulk: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), non-interlaced, all five scanline filters
(None/Sub/Up/Average/Paeth). Interlaced (Adam7) and 16-bit images raise
with a clear message — at pipeline scale those are rare enough to route
to a quarantine column, not worth a 3x decoder.

Encoder emits valid non-interlaced 8-bit PNGs (filter 0 rows) for gray /
RGB / RGBA arrays — used to synthesize REAL image payloads in tests and
in synth_media, so the decode path is exercised on genuine byte streams.

The hot loops are vectorized per scanline (numpy); Up/None/Sub/Average/
Paeth defilters run O(width) numpy ops per row except the inherently
sequential Sub/Paeth carries, which use small per-row Python loops over
PIXELS-as-vectors (channels vectorized).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 array (H,W) | (H,W,3) | (H,W,4) -> PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, nch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, nch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, nch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # one filter-type byte (0 = None) prefixes every scanline
    raw = np.empty((h, 1 + w * nch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * nch)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _defilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters. raw is (h, 1+stride) uint8 (filter byte
    + filtered bytes); returns (h, stride) recovered bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub: sequential in x, vectorized over channels
            cur = line.copy()
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] = (cur[x : x + bpp] + cur[x - bpp : x]) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            cur[:bpp] = (cur[:bpp] + (prev[:bpp] >> 1)) & 0xFF
            for x in range(bpp, stride, bpp):
                cur[x : x + bpp] = (
                    cur[x : x + bpp]
                    + ((cur[x - bpp : x] + prev[x : x + bpp]) >> 1)
                ) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            cur[:bpp] = (cur[:bpp] + prev[:bpp]) & 0xFF  # left=0, ul=0 -> up
            for x in range(bpp, stride, bpp):
                a = cur[x - bpp : x]
                b = prev[x : x + bpp]
                c = prev[x - bpp : x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                cur[x : x + bpp] = (cur[x : x + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} on row {y}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H,W) gray or (H,W,C) color.

    Palette images are expanded to RGB; gray+alpha and RGBA keep their
    alpha channel.
    """
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc_stored = data[pos + 8 + length : pos + 12 + length]
        if len(payload) != length or len(crc_stored) != 4:
            raise ValueError(f"truncated {kind!r} chunk")
        if struct.unpack(">I", crc_stored)[0] != (
            zlib.crc32(kind + payload) & 0xFFFFFFFF
        ):
            raise ValueError(f"CRC mismatch in {kind!r} chunk")
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif kind == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"bit depth {depth} unsupported (8 only)")
    if interlace:
        raise ValueError("Adam7 interlaced PNG unsupported")
    if comp or filt:
        raise ValueError("nonstandard compression/filter method")
    nch = _CHANNELS.get(color_type)
    if nch is None:
        raise ValueError(f"unknown color type {color_type}")
    stride = w * nch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError(
            f"IDAT size {raw.size} != expected {h * (stride + 1)}"
        )
    px = _defilter(raw.reshape(h, stride + 1), h, stride, nch)
    img = px.reshape(h, w, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        img = palette[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img
