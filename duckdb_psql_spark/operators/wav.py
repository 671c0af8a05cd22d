"""WAV (RIFF/WAVE) codec: pure-python/numpy PCM decode + encode.

The audio member of the multimodal codec family (png.py, jpeg.py,
gif.py, tiff.py, webp.py): container-format WAV needs no external
library, so — unlike the lossy/compressed audio formats (mp3/ogg/flac,
which stay deployment-kernel swaps) — it decodes for REAL here:

* PCM 8-bit (unsigned) / 16 / 24 / 32-bit (signed little-endian)
* IEEE float32 / float64 (format code 3)
* WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping either of the above
* proper RIFF chunk walk (unknown chunks skipped, odd-size padding)

Corruption (truncated chunks, partial frames, unknown codec ids) raises
:class:`WavError` / ``NotImplementedError`` with deterministic messages —
the distributed path (multimodal.decode_audio) converts those to per-row
error values, same contract as image decode.

Samples are returned as float64 in [-1, 1] (the usual DSP convention),
shape ``(n_frames, channels)``.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed RIFF/WAVE payload."""


def is_wav(content: bytes) -> bool:
    return (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    )


def _chunks(b: bytes):
    """Walk RIFF sub-chunks: yields (chunk_id, payload). Odd chunk sizes
    carry a pad byte (RIFF spec); a declared size past the end of the
    stream is corruption, not EOF."""
    pos, n = 12, len(b)
    while pos + 8 <= n:
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        start = pos + 8
        end = start + size
        if end > n:
            raise WavError(
                f"truncated {cid!r} chunk: declares {size} bytes, "
                f"{n - start} remain"
            )
        yield cid, b[start:end]
        pos = end + (size & 1)


def decode_wav(content: bytes) -> dict:
    """Decode a WAV payload → dict(rate, channels, bits, n_frames,
    samples, pcm_bytes).

    ``samples`` is float64 in [-1, 1], shape (n_frames, channels);
    ``pcm_bytes`` is the raw data-chunk payload (for integrity CRCs).
    """
    b = bytes(content)
    if not is_wav(b):
        raise WavError("not a RIFF/WAVE stream")
    fmt = data = None
    for cid, payload in _chunks(b):
        if cid == b"fmt " and fmt is None:
            fmt = payload
        elif cid == b"data" and data is None:
            data = payload
    if fmt is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    if len(fmt) < 16:
        raise WavError(f"fmt chunk too short ({len(fmt)} bytes)")
    code, channels, rate, _byterate, _block, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if code == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: real code = first 2 bytes of SubFormat
        if len(fmt) < 40:
            raise WavError("extensible fmt chunk too short")
        (code,) = struct.unpack_from("<H", fmt, 24)
    if channels < 1:
        raise WavError("zero channels")
    if rate < 1:
        raise WavError("zero sample rate")
    if code == 1:  # integer PCM
        if bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            arr = (arr - 128.0) / 128.0
            width = 1
        elif bits == 16:
            width = 2
            if len(data) % width:
                raise WavError("data chunk is not whole 16-bit samples")
            arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            width = 3
            if len(data) % width:
                raise WavError("data chunk is not whole 24-bit samples")
            raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            width = 4
            if len(data) % width:
                raise WavError("data chunk is not whole 32-bit samples")
            arr = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif code == 3:  # IEEE float
        if bits == 32:
            width = 4
            if len(data) % width:
                raise WavError("data chunk is not whole float32 samples")
            arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            width = 8
            if len(data) % width:
                raise WavError("data chunk is not whole float64 samples")
            arr = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE-float WAV")
    else:
        raise NotImplementedError(
            f"WAV format code {code} (ADPCM/mu-law/compressed audio needs "
            "ffmpeg/librosa; swap this kernel in deployment)"
        )
    if arr.size % channels:
        raise WavError(
            f"data chunk holds {arr.size} samples — not a whole number of "
            f"{channels}-channel frames"
        )
    samples = arr.reshape(-1, channels)
    return {
        "rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_frames": int(samples.shape[0]),
        "samples": samples,
        "pcm_bytes": data,
    }


def encode_wav(samples: np.ndarray, rate: int, *, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) or (n, channels)) as
    PCM WAV. ``bits`` ∈ {16, 32}; values clip at full scale."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    if bits == 16:
        full = 32767.0
        data = (
            np.clip(np.rint(x * full), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
        code = 1
    elif bits == 32:
        full = float((1 << 31) - 1)
        data = (
            np.clip(np.rint(x * full), -(1 << 31), (1 << 31) - 1)
            .astype("<i4")
            .tobytes()
        )
        code = 1
    else:
        raise NotImplementedError(f"encode_wav: {bits}-bit output")
    width = bits // 8
    fmt = struct.pack(
        "<HHIIHH", code, channels, rate, rate * channels * width,
        channels * width, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(decoded: dict) -> dict:
    """Deterministic DSP summary of a decoded WAV: duration, RMS level
    (dBFS, floored at -100), absolute peak, zero-crossing rate of the
    channel-mean signal. All float64 numpy — bit-reproducible across
    hosts, rounded to 6 dp for cross-engine value checks."""
    x = decoded["samples"]
    rate = decoded["rate"]
    mono = x.mean(axis=1) if x.size else np.zeros(0)
    n = mono.shape[0]
    duration_ms = int(round(n * 1000.0 / rate))
    if n:
        rms = float(np.sqrt(np.mean(mono * mono)))
        rms_db = round(20.0 * np.log10(max(rms, 1e-5)), 6)
        peak = round(float(np.max(np.abs(x))), 6)
        signs = np.signbit(mono)
        zcr = round(float(np.count_nonzero(signs[1:] != signs[:-1]))
                    / max(n - 1, 1), 6)
    else:
        rms_db, peak, zcr = -100.0, 0.0, 0.0
    return {
        "duration_ms": duration_ms,
        "rms_db": rms_db,
        "peak_abs": peak,
        "zcr": zcr,
    }


def resample_linear(decoded: dict, new_rate: int) -> np.ndarray:
    """Linear-interpolation resample to ``new_rate`` (per channel).

    The standard cheap kernel (production swaps in polyphase/sinc); the
    sample positions are computed in float64 from integer indices, so the
    output is deterministic.
    """
    x = decoded["samples"]
    rate = decoded["rate"]
    n = x.shape[0]
    if n == 0 or new_rate == rate:
        return x
    new_n = max(int(round(n * new_rate / rate)), 1)
    src = np.arange(new_n, dtype=np.float64) * (rate / float(new_rate))
    src = np.clip(src, 0, n - 1)
    out = np.empty((new_n, x.shape[1]), dtype=np.float64)
    for c in range(x.shape[1]):
        out[:, c] = np.interp(src, np.arange(n, dtype=np.float64), x[:, c])
    return out
