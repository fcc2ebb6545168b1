"""ctypes bindings for the native C++ audio runtime (native/ta_audio.cpp).

The library is built lazily with g++ on first use (cached under
``native/build/``); every entry point has a pure-numpy fallback, and the
numpy implementations remain the test oracle (tests/test_native.py pins
native == numpy numerics).

Public surface:
- :func:`available` — did the library build/load?
- :func:`wav_decode` — WAV bytes -> (float32 mono, rate)
- :func:`resample` — windowed-sinc arbitrary-ratio resampling
- :func:`fft_convolve` — same-length FFT convolution (RIR augmentation)
- :func:`mix_at_snr` — additive noise at a target SNR
- :func:`vad_features` — per-frame energy dB + spectral flatness
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libta_audio.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = _NATIVE_DIR / "ta_audio.cpp"
    if not src.exists():
        return False
    _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
    # compile to a per-process temp path and atomically rename: concurrent
    # processes (dataloader workers) building simultaneously must never let
    # a third process CDLL a half-written .so (which latches that process
    # onto the numpy fallback for its lifetime)
    tmp = _LIB_PATH.with_suffix(f".so.tmp{os.getpid()}")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             str(src), "-o", str(tmp)],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        tmp.unlink(missing_ok=True)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TA_DISABLE_NATIVE") == "1":
            return None
        src = _NATIVE_DIR / "ta_audio.cpp"
        stale = not _LIB_PATH.exists() or (
            src.exists() and _LIB_PATH.stat().st_mtime < src.stat().st_mtime
        )  # a prebuilt .so without sources is simply used as-is
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None

        lib.ta_wav_info.restype = ctypes.c_int
        lib.ta_wav_info.argtypes = [
            _u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ta_wav_decode.restype = ctypes.c_int64
        lib.ta_wav_decode.argtypes = [_u8p, ctypes.c_int64, _f32p]
        lib.ta_resample.restype = ctypes.c_int64
        lib.ta_resample.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, _f32p,
        ]
        lib.ta_fft_convolve.restype = ctypes.c_int64
        lib.ta_fft_convolve.argtypes = [
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, _f32p,
        ]
        lib.ta_mix_snr.restype = ctypes.c_int
        lib.ta_mix_snr.argtypes = [
            _f32p, ctypes.c_int64, _f32p, ctypes.c_int64, ctypes.c_float,
        ]
        lib.ta_vad_features.restype = ctypes.c_int64
        lib.ta_vad_features.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int32, _f32p, _f32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ----------------------------------------------------------------- wrappers


def wav_decode(data: bytes) -> Optional[tuple[np.ndarray, int]]:
    """WAV bytes -> (float32 mono, rate); None when native is unavailable
    or the format is unsupported (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    frames = ctypes.c_int64()
    rate = ctypes.c_int32()
    if lib.ta_wav_info(buf, buf.size, ctypes.byref(frames), ctypes.byref(rate)):
        return None
    out = np.empty(frames.value, np.float32)
    n = lib.ta_wav_decode(buf, buf.size, out)
    if n < 0:
        return None
    return out[:n], int(rate.value)


def resample(audio: np.ndarray, orig_rate: int, target_rate: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    # EXACT integer ceil, matching ta_resample's out_len formula — float
    # ceil disagreed by one at some rate pairs, and C writing one element
    # past this buffer is silent heap corruption
    out_len = (len(audio) * target_rate + orig_rate - 1) // orig_rate
    out = np.empty(max(out_len, 1), np.float32)
    n = lib.ta_resample(audio, len(audio), orig_rate, target_rate, out)
    if n < 0 or n > out.size:
        return None
    return out[:n]


def fft_convolve(a: np.ndarray, kernel: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32)
    kernel = np.ascontiguousarray(kernel, np.float32)
    out = np.empty(len(a), np.float32)
    n = lib.ta_fft_convolve(a, len(a), kernel, len(kernel), out)
    return out if n == len(a) else None


def mix_at_snr(audio: np.ndarray, noise: np.ndarray, snr_db: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(audio, np.float32).copy()
    noise = np.ascontiguousarray(noise, np.float32)
    lib.ta_mix_snr(out, len(out), noise, len(noise), float(snr_db))
    return out


def vad_features(audio: np.ndarray, hop: int) -> Optional[tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    frames = len(audio) // hop
    if frames <= 0:
        return np.zeros(0, np.float32), np.zeros(0, np.float32)
    energy = np.empty(frames, np.float32)
    flat = np.empty(frames, np.float32)
    n = lib.ta_vad_features(audio, len(audio), hop, energy, flat)
    if n != frames:
        return None
    return energy, flat
