"""Audio I/O without external dependencies: WAV read/write + resampling.

The reference shells out to ffmpeg via HF's ``ffmpeg_read``
(``/root/reference/tiny_audio/asr_pipeline.py:161-185``); this environment is
hermetic, so we read PCM WAV with the stdlib and resample with scipy's
polyphase filter.
"""

from __future__ import annotations

import io
import wave
from pathlib import Path
from typing import Union

import numpy as np


def read_wav(source: Union[str, Path, bytes]) -> tuple[np.ndarray, int]:
    """Read a PCM WAV file/bytes -> (float32 mono waveform in [-1, 1], rate).

    Decodes through the native C++ runtime (native/ta_audio.cpp) when built,
    with this stdlib implementation as the fallback and the test oracle."""
    if isinstance(source, (str, Path)):
        data = Path(source).read_bytes()
    else:
        data = source

    from tiny_audio_tpu import native

    decoded = native.wav_decode(data)
    if decoded is not None:
        return decoded

    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sampwidth == 2:
        audio = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 4:
        audio = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        audio = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {sampwidth}")
    if n_channels > 1:
        audio = audio.reshape(-1, n_channels).mean(axis=1)
    return audio, rate


def write_wav(path: Union[str, Path], audio: np.ndarray, rate: int = 16000) -> None:
    audio16 = np.clip(audio, -1.0, 1.0)
    audio16 = (audio16 * 32767.0).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(audio16.tobytes())


def resample(audio: np.ndarray, orig_rate: int, target_rate: int = 16000) -> np.ndarray:
    if orig_rate == target_rate:
        return audio.astype(np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_rate, target_rate)
    out = resample_poly(audio.astype(np.float64), target_rate // g, orig_rate // g)
    return out.astype(np.float32)
