"""Whisper-compatible log-mel front-end as a jitted TPU computation.

The reference computes mel features on CPU inside dataloader workers with
``WhisperFeatureExtractor`` (its documented training bottleneck,
``/root/reference/configs/experiments/embedded.yaml:36-39``;
``asr_modeling.py:190-201``).  Here the STFT is reformulated as a strided
convolution against a windowed DFT basis so the whole front-end (framing, DFT,
power, mel filterbank, log, normalization) is one XLA graph on the MXU:

    frames  = hop-chunked reshape of pad_reflect(audio)   (no gather, no conv)
    stft    = frames @ (window * [cos|sin] DFT basis)     (one MXU matmul)
    power   = cos^2 + sin^2
    mel     = power @ mel_filters
    logmel  = (max(log10(clip(mel)), rowmax - 8) + 4) / 4

Numerics match ``transformers.WhisperFeatureExtractor`` (hann window 400, hop
160, n_fft 400, slaney mel scale + norm, per-sample max normalization,
last-frame drop) to ~1e-4 — verified in ``tests/test_mel.py``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds — Whisper's fixed window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE


def hertz_to_mel_slaney(freq):
    """Slaney-style mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, min_log_hertz) / min_log_hertz) * logstep,
        mels,
    )


def mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        min_log_hertz * np.exp(logstep * (mels - min_log_mel)),
        freq,
    )


def mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float = 0.0,
    max_frequency: float = 8000.0,
    sampling_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """Triangular mel filterbank, slaney scale + slaney norm.

    Returns [num_frequency_bins, num_mel_filters] float64, matching
    ``transformers.audio_utils.mel_filter_bank(norm="slaney",
    mel_scale="slaney")`` numerics.
    """
    mel_min = hertz_to_mel_slaney(min_frequency)
    mel_max = hertz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz_slaney(mel_freqs)
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    filter_diff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(np.zeros(1), np.minimum(down_slopes, up_slopes))

    # Slaney normalization: scale each filter by 2 / bandwidth
    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb *= np.expand_dims(enorm, 0)
    return fb


# Frames are assembled from hop-sized chunks, so the window length must be a
# multiple of HOP_LENGTH; the basis is zero-padded from 400 to 480 columns
# (mathematically identical — the window is zero there).
FRAME_CHUNKS = -(-N_FFT // HOP_LENGTH)  # 3
PADDED_FRAME = FRAME_CHUNKS * HOP_LENGTH  # 480


def _dft_basis(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: (cos, sin) each [n_freq, n_fft], hann-windowed."""
    n_freq = n_fft // 2 + 1
    # Periodic hann window (matches transformers.audio_utils.window_function)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    cos_b = np.cos(ang) * window[None, :]
    sin_b = -np.sin(ang) * window[None, :]
    return cos_b, sin_b


@functools.lru_cache(maxsize=8)
def _constants(num_mel_bins: int) -> tuple[np.ndarray, np.ndarray]:
    """(dft_basis [PADDED_FRAME, 2*n_freq], mel_fb [n_freq, n_mels]) float32."""
    cos_b, sin_b = _dft_basis()
    basis = np.concatenate([cos_b, sin_b], axis=0)  # [2*n_freq, n_fft]
    basis = np.pad(basis, ((0, 0), (0, PADDED_FRAME - N_FFT)))
    fb = mel_filter_bank(N_FFT // 2 + 1, num_mel_bins).astype(np.float32)
    return basis.T.astype(np.float32), fb


def num_frames(num_samples: int) -> int:
    """Mel frame count for a padded sample count (HF drops the final frame)."""
    return num_samples // HOP_LENGTH


@functools.partial(jax.jit, static_argnames=("num_mel_bins",))
def log_mel_spectrogram(audio: jax.Array, num_mel_bins: int = 128) -> jax.Array:
    """Compute Whisper-style log-mel features.

    Args:
        audio: [batch, num_samples] float32 waveform at 16 kHz.  ``num_samples``
            must be a multiple of ``HOP_LENGTH`` (pad with zeros first).
        num_mel_bins: 80 (whisper-base lineage) or 128 (large-v3 / GLM-ASR).

    Returns:
        [batch, num_mel_bins, num_samples // HOP_LENGTH] float32 features.
    """
    basis_np, fb_np = _constants(num_mel_bins)
    basis = jnp.asarray(basis_np)
    fb = jnp.asarray(fb_np)

    audio = audio.astype(jnp.float32)
    batch, n_samples = audio.shape
    n_frames = n_samples // HOP_LENGTH

    # center=True reflect padding of n_fft // 2 on both sides, plus trailing
    # zeros so the chunk view covers frame starts up to (n_frames-1)*hop.
    # Reflect needs pad < length; inputs shorter than N_FFT//2+1 samples
    # (sub-13 ms — degenerate, but reachable by direct callers) fall back to
    # zero padding instead of raising from inside jnp.pad.
    pad_mode = "reflect" if n_samples > N_FFT // 2 else "constant"
    padded = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode=pad_mode)
    tail = (n_frames + FRAME_CHUNKS) * HOP_LENGTH - padded.shape[1]
    if tail > 0:
        padded = jnp.pad(padded, ((0, 0), (0, tail)))

    # Overlapping frames without gather: hop-sized chunks, frame t is the
    # concatenation of chunks [t, t+1, t+2] (window zero past sample 400).
    chunks = padded.reshape(batch, -1, HOP_LENGTH)
    frames = jnp.concatenate(
        [chunks[:, i : i + n_frames] for i in range(FRAME_CHUNKS)], axis=-1
    )  # [B, T, PADDED_FRAME]  (the final partial frame is dropped: HF [:, :-1])

    # One MXU matmul: [B, T, 480] @ [480, 2*n_freq]
    stft = jnp.einsum(
        "btn,nf->btf",
        frames,
        basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    n_freq = N_FFT // 2 + 1
    power = stft[..., :n_freq] ** 2 + stft[..., n_freq:] ** 2  # [B, T, n_freq]

    mel = jnp.einsum(
        "btf,fm->bmt",
        power,
        fb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    # Per-sample dynamic-range clamp + affine normalization
    global_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    return (log_spec + 4.0) / 4.0


def frame_attention_mask(lengths: jax.Array, n_frames: int) -> jax.Array:
    """[B, n_frames] mask of real (non-padding) mel frames.

    Matches HF's ``attention_mask[:, ::hop_length]``: frame ``t`` is real iff
    sample ``t * hop`` is within the unpadded waveform.
    """
    idx = jnp.arange(n_frames)[None, :] * HOP_LENGTH
    return (idx < lengths[:, None]).astype(jnp.int32)


def pad_to_multiple(x: np.ndarray, multiple: int = HOP_LENGTH) -> np.ndarray:
    """Right-pad 1-D audio with zeros to a multiple of ``multiple`` samples."""
    n = x.shape[-1]
    target = int(math.ceil(n / multiple)) * multiple if n else multiple
    if target == n:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - n)]
    return np.pad(x, pad)
