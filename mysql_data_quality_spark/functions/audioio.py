"""Pure-numpy WAV (RIFF PCM) codec — the audio analogue of
``functions/imageio.py``: the RIFF/WAVE byte layout is fully public, so
the multimodal operators' REAL audio decode path is exercisable without
ffmpeg/soundfile.  PCM (format 1) at 8/16/32-bit and IEEE float
(format 3) at 32-bit are supported; anything compressed raises and the
caller falls to the typed ``DecodeUnavailable`` env gate.

Decoded samples are float64 in [-1, 1], shape (frames, channels) —
deterministic integer-to-float scaling, no resampling."""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    """Payload is not a supported RIFF/WAVE byte stream."""


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (samples float64 [-1,1] of shape (frames, channels),
    sample_rate)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            if len(body) < 16:
                raise AudioFormatError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) != csz:
                raise AudioFormatError(
                    f"data chunk truncated: {len(body)} of {csz} bytes"
                )
            data = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + csz + (csz & 1)
    if fmt is None or data is None:
        raise AudioFormatError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if channels < 1 or rate < 1:
        raise AudioFormatError(f"bad WAV geometry ch={channels} rate={rate}")
    if audio_fmt == 1 and bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        samples = (raw - 128.0) / 128.0  # 8-bit PCM is unsigned
    elif audio_fmt == 1 and bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float64)
        # symmetric with the encoder's *32767 so encode(decode(x)) is a
        # FIXED POINT (re-transcoding never drifts payload hashes); the
        # one asymmetric code -32768 maps just below -1.0
        samples = raw / 32767.0
    elif audio_fmt == 1 and bits == 32:
        raw = np.frombuffer(data, dtype="<i4").astype(np.float64)
        samples = raw / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        samples = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise AudioFormatError(
            f"unsupported WAV encoding fmt={audio_fmt} bits={bits} "
            "(PCM 8/16/32 and float32 only)"
        )
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), rate


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """(frames, channels) float in [-1,1] -> 16-bit PCM RIFF bytes
    (deterministic: round-half-away clamp)."""
    if bits != 16:
        raise AudioFormatError("encoder emits 16-bit PCM only")
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise AudioFormatError(f"expected (frames, channels), got {a.shape}")
    frames, channels = a.shape
    pcm = np.clip(np.rint(a * 32767.0), -32768, 32767).astype("<i2")
    body = pcm.reshape(-1).tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> list:
    """Deterministic signal features in a fixed-width vector: duration
    (s, capped at 1e4 for range), RMS, peak, zero-crossing rate, DC
    offset, and a 3-bucket absolute-amplitude histogram — enough signal
    for downstream dedup/similarity consumers to be meaningfully
    exercised on real audio."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return [0.0] * dim
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    hist, _ = np.histogram(np.abs(mono), bins=3, range=(0.0, 1.0))
    feat = [
        min(float(n) / float(rate), 1e4),
        float(np.sqrt(np.mean(mono**2))),
        float(np.max(np.abs(mono))),
        zc / max(n - 1, 1),
        float(mono.mean()),
        *(hist / n).astype(float).tolist(),
    ]
    return feat[:dim] + [0.0] * max(0, dim - len(feat))
