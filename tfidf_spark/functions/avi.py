"""Pure-stdlib AVI demuxer/muxer (struct + numpy): makes the multimodal
VIDEO frame-sampling path REAL in a container with no pyav/ffmpeg.

Format: the classic RIFF 'AVI ' container with a single uncompressed
video stream — 'DIB ' handler, BI_RGB 24-bit bottom-up frames in '00db'
chunks (the layout every AVI tool emits for raw video; a file produced
by ``avi_encode`` opens in ffplay/VLC). That is deliberately the ONLY
supported codec: real video codecs (h264 etc.) need external decoders,
and at pipeline scale compressed inputs are transcoded upstream; rows
with other handlers raise with a clear message so they route to a
quarantine column.

Frame SAMPLING (the scale-relevant operation — decode every k-th frame,
skip the rest) never touches the bytes of skipped frames: the demuxer
walks chunk headers only, then decodes just the selected '00db' chunks.

Layout written/read (all little-endian):

  RIFF(size,'AVI ')
    LIST('hdrl')
      'avih' (56B: usec/frame, maxbps, pad, flags, total frames, initial
              frames, streams, bufsize, width, height, 4 reserved)
      LIST('strl')
        'strh' (56B: 'vids','DIB ', flags, prio, lang, initial frames,
                scale, rate, start, length, bufsize, quality, sample
                size, rcFrame)
        'strf' (40B BITMAPINFOHEADER: size, width, height, planes=1,
                bitcount=24, compression=0(BI_RGB), size image, ...)
    LIST('movi')
      '00db' raw frame (rows bottom-up, BGR, stride padded to 4 bytes)
      ... one chunk per frame, word-aligned per RIFF
"""

from __future__ import annotations

import struct

import numpy as np


def _stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def avi_encode(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """RIFF-AVI bytes from (H, W, 3) uint8 RGB frames (all same shape)."""
    if not frames:
        raise ValueError("avi_encode: need at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("avi_encode: frames must be (H, W, 3) RGB")
    stride = _stride(w)
    frame_bytes = stride * h

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\0" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    def dib(frame: np.ndarray) -> bytes:
        if frame.shape != (h, w, 3):
            raise ValueError("avi_encode: all frames must share one shape")
        rows = frame[::-1, :, ::-1].astype(np.uint8)  # bottom-up, BGR
        if stride == w * 3:
            return rows.tobytes()
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = rows.reshape(h, w * 3)
        return padded.tobytes()

    avih = chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps, frame_bytes * fps, 0, 0,  # flags 0: no idx1
            len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIiI4H",
            0, 0, 0, 0,          # flags, prio, lang, initial frames
            1, fps,              # scale, rate -> rate/scale fps
            0, len(frames),      # start, length
            frame_bytes, -1, 0,  # bufsize, quality (signed), sample size
            0, 0, w, h,          # rcFrame
        ),
    )
    strf = chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len); word-aligned advance."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos: pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _find_list(data: bytes, start: int, end: int, want: bytes):
    for fourcc, off, size in _walk_chunks(data, start, end):
        if fourcc == b"LIST" and data[off: off + 4] == want:
            return off + 4, off + size
    raise ValueError(f"avi: missing LIST {want!r}")


def avi_info(data: bytes) -> dict:
    """Header fields needed for sampling: width, height, usec/frame,
    n_frames. Validates the single-stream uncompressed-DIB contract."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF AVI stream")
    hdrl_s, hdrl_e = _find_list(data, 12, len(data), b"hdrl")
    usec = n_frames = width = height = None
    for fourcc, off, size in _walk_chunks(data, hdrl_s, hdrl_e):
        if fourcc == b"avih":
            usec, _, _, _, n_frames = struct.unpack_from("<5I", data, off)
            width, height = struct.unpack_from("<2I", data, off + 32)
        elif fourcc == b"LIST" and data[off: off + 4] == b"strl":
            for f2, o2, s2 in _walk_chunks(data, off + 4, off + size):
                if f2 == b"strh":
                    if data[o2: o2 + 4] != b"vids" or data[o2 + 4: o2 + 8] not in (
                        b"DIB ", b"\0\0\0\0"
                    ):
                        raise ValueError(
                            "avi: only uncompressed 'DIB ' video streams are "
                            "decodable here — route other codecs to quarantine"
                        )
                elif f2 == b"strf":
                    _, bw, bh, _, bitcount, compression = struct.unpack_from(
                        "<IiiHHI", data, o2
                    )
                    if bitcount != 24 or compression != 0:
                        raise ValueError("avi: only 24-bit BI_RGB frames supported")
    if usec is None or not width or not height:
        raise ValueError("avi: malformed header (no avih)")
    return {
        "usec_per_frame": usec,
        "n_frames": n_frames,
        "width": width,
        "height": height,
    }


def avi_sample_frames(data: bytes, every_ms: int = 1000) -> list[np.ndarray]:
    """Decode every k-th frame (k = every_ms / frame duration, min 1) as
    (H, W, 3) uint8 RGB. Skipped frames' bytes are never read — the
    demuxer walks chunk headers only."""
    info = avi_info(data)
    w, h = info["width"], info["height"]
    stride = _stride(w)
    step = max(1, round(every_ms * 1000 / max(1, info["usec_per_frame"])))
    movi_s, movi_e = _find_list(data, 12, len(data), b"movi")
    out: list[np.ndarray] = []
    idx = 0
    for fourcc, off, size in _walk_chunks(data, movi_s, movi_e):
        if fourcc[2:] not in (b"db", b"dc"):
            continue
        if idx % step == 0:
            if size < stride * h:
                raise ValueError("avi: truncated frame chunk")
            rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
            rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            out.append(rows[::-1, :, ::-1].copy())  # top-down, RGB
        idx += 1
    return out
