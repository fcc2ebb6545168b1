"""Fused Pallas TPU kernel for the Whisper log-mel front-end.

The XLA path (:mod:`tiny_audio_tpu.ops.mel`) materializes three HBM
intermediates per batch — overlapping frames [B, T, 480], the STFT
[B, T, 402], and the power spectrum [B, T, 201] (~0.8 GB of traffic at
batch 32) — because the frame-assembly concat and the two matmuls are
separate HLOs.  This kernel fuses the whole chain per 256-frame tile in
VMEM:

    audio chunks -> overlapped frames -> windowed-DFT matmul (MXU)
    -> power -> mel filterbank matmul (MXU) -> log10

Only the final [B, mels, T] tensor ever hits HBM.  The per-sample
dynamic-range normalization (global max - 8 clamp) stays in XLA: it is a
cheap cross-tile reduction.

Measured on v5e (B=32 x 30 s): 34.9 ms vs 32.0 ms for the XLA path — XLA's
own fusion already keeps this op off the bandwidth roofline, so the XLA
implementation remains the default and this kernel is the tuning base for
future front-end work (e.g. fusing the mel directly into the encoder's
first conv).

Alignment: the DFT basis is zero-padded from 480x402 to 512x512 and the mel
filterbank to 512x"mel rows" so every matmul is 128-lane aligned; frame
count is padded to the 256-frame tile and sliced by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.ops import mel as _mel

TILE_T = 256            # frames per kernel instance
N_FREQ_PAD = 256        # 201 freq bins padded to a lane multiple
FRAME_PAD = 512         # 480-sample frame padded for the MXU
CHUNK = _mel.HOP_LENGTH  # 160


@functools.lru_cache(maxsize=4)
def _kernel_constants(num_mel_bins: int) -> tuple[np.ndarray, np.ndarray]:
    """(basis [512, 512], fb [256, mel_pad]) float32, zero-padded."""
    cos_b, sin_b = _mel._dft_basis()          # each [201, 480]
    n_freq = cos_b.shape[0]
    basis = np.zeros((FRAME_PAD, 2 * N_FREQ_PAD), np.float32)
    basis[: cos_b.shape[1], :n_freq] = cos_b.T
    basis[: sin_b.shape[1], N_FREQ_PAD : N_FREQ_PAD + n_freq] = sin_b.T

    fb_core = _mel.mel_filter_bank(n_freq, num_mel_bins).astype(np.float32)
    mel_pad = -(-num_mel_bins // 128) * 128
    fb = np.zeros((N_FREQ_PAD, mel_pad), np.float32)
    fb[:n_freq, :num_mel_bins] = fb_core
    return basis, fb


def _mel_kernel(c0_ref, c1_ref, c2_ref, basis_ref, fb_ref, out_ref):
    """One (batch, frame-tile) program.

    c{0,1,2}_ref: [1, TILE_T, CHUNK] hop-sized audio chunks shifted by
    0/1/2 hops — frame t's 480-sample window is their row-t concat.
    out_ref:      [1, mel_pad, TILE_T] log-mel (pre-normalization).
    """
    frames = jnp.concatenate(
        [
            c0_ref[0],
            c1_ref[0],
            c2_ref[0],
            jnp.zeros((TILE_T, FRAME_PAD - 3 * CHUNK), jnp.float32),
        ],
        axis=1,
    )  # [TILE_T, FRAME_PAD]

    # HIGHEST: fp32 via bf16x3 MXU passes — the default single bf16 pass
    # loses ~2 decimal digits, which the power-spectrum squaring amplifies
    # past the HF-oracle tolerance.
    stft = jnp.dot(
        frames, basis_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    power = stft[:, :N_FREQ_PAD] ** 2 + stft[:, N_FREQ_PAD:] ** 2
    mel = jnp.dot(
        power, fb_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10)).T


@functools.partial(jax.jit, static_argnames=("num_mel_bins", "interpret"))
def log_mel_spectrogram_pallas(
    audio: jax.Array, num_mel_bins: int = 128, interpret: bool = False
) -> jax.Array:
    """Drop-in fused equivalent of :func:`tiny_audio_tpu.ops.mel.log_mel_spectrogram`.

    audio: [B, num_samples] float32, num_samples a multiple of HOP_LENGTH.
    Returns [B, num_mel_bins, num_samples // HOP_LENGTH] float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    basis_np, fb_np = _kernel_constants(num_mel_bins)
    mel_pad = fb_np.shape[1]

    audio = audio.astype(jnp.float32)
    batch, n_samples = audio.shape
    n_frames = n_samples // _mel.HOP_LENGTH
    n_tiles = -(-n_frames // TILE_T)

    # center=True reflect pad + zeros so every tile's chunk window exists
    # (same sub-13 ms constant-pad fallback as ops/mel.py — the drop-in
    # contract must not diverge on the edge case the XLA path guards)
    pad_mode = "reflect" if n_samples > _mel.N_FFT // 2 else "constant"
    padded = jnp.pad(
        audio, ((0, 0), (_mel.N_FFT // 2, _mel.N_FFT // 2)), mode=pad_mode
    )
    need = (n_tiles * TILE_T + 2) * CHUNK
    if padded.shape[1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    # three hop-shifted chunk views -> non-overlapping kernel blocks
    n_rows = n_tiles * TILE_T
    shifted = [
        padded[:, s * CHUNK : s * CHUNK + n_rows * CHUNK].reshape(
            batch, n_rows, CHUNK
        )
        for s in range(3)
    ]

    chunk_spec = pl.BlockSpec(
        (1, TILE_T, CHUNK),
        lambda b, t: (b, t, 0),  # block-unit indices
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _mel_kernel,
        grid=(batch, n_tiles),
        in_specs=[
            chunk_spec,
            chunk_spec,
            chunk_spec,
            pl.BlockSpec(
                (FRAME_PAD, 2 * N_FREQ_PAD),
                lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_FREQ_PAD, mel_pad), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, mel_pad, TILE_T),
            lambda b, t: (b, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, mel_pad, n_tiles * TILE_T), jnp.float32
        ),
        interpret=interpret,
    )(*shifted, jnp.asarray(basis_np), jnp.asarray(fb_np))

    log_spec = out[:, :num_mel_bins, :n_frames]
    global_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    return (log_spec + 4.0) / 4.0
