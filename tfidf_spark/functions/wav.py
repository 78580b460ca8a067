"""Pure-stdlib PCM16 WAV codec (the ``wave`` module + numpy): the
multimodal audio path's real decoder. Kept next to functions/png.py and
functions/avi.py — one stdlib codec module per modality."""

from __future__ import annotations

import numpy as np


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32/-1..1 or int16 mono samples -> PCM16 WAV bytes (stdlib
    ``wave`` writer)."""
    import io
    import wave

    s = np.asarray(samples)
    if s.dtype != np.int16:
        s = np.clip(s, -1.0, 1.0)
        s = (s * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> np.ndarray:
    """PCM16 WAV bytes -> float32 samples in [-1, 1] (channels averaged
    to mono — feature extraction downstream is mono)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        nch = wf.getnchannels()
        frames = wf.readframes(wf.getnframes())
    s = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
    if nch > 1:
        s = s.reshape(-1, nch).mean(axis=1)
    return s
