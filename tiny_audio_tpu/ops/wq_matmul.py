"""Weight-only int8 matmul Pallas kernel for the decode step.

Decode is weight-read-bound: each greedy step streams ~1.2 GB of bf16
decoder weights through HBM for a [B<=48, K~1024] activation.  Halving the
weight bytes halves the floor — but XLA does NOT fuse the int8->bf16
dequantization into the dot's weight read (measured on this chip,
scripts/bench_wq_matmul.py: ``x @ w_i8.astype(bf16) * s`` runs SLOWER than
the bf16 dot at both the LM-head and MLP shapes because a dequantized copy
materializes).  This kernel does the convert in VMEM, tile by tile:

- grid over N tiles; the activation block [B, K] stays resident;
- each program DMAs one int8 weight tile [K, NT] (half the bf16 bytes),
  converts to bf16 in VMEM, dots on the MXU with an f32 accumulator, and
  applies the per-output-channel scale before the bf16 store.

Quantization is symmetric per-output-channel (scale = max|w[:, n]| / 127),
the standard weight-only recipe.  The reference serves bf16/fp16 torch
weights with no quantization (/root/reference/tiny_audio/handler.py); this
is TPU-serving-specific bandwidth machinery, opt-in and measured.

The XLA dequant dot (`wq_matmul_xla`) is the CPU/test fallback and the
numerical oracle — the kernel must match it exactly (same bf16 convert,
f32 accumulate, f32 scale, bf16 store).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NT = 512  # N tile: int8 weight tile [K<=3072, 512] <= 1.5 MB, 2x buffered


def quantize_weight(w) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization of ``w [K, N]``.

    Returns ``(w_i8 [K, N] int8, scale [N] f32)`` with
    ``w ~= w_i8 * scale[None, :]``.
    """
    w = jnp.asarray(w)
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)  # all-zero column guard
    w_i8 = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[None, :]), -127, 127
    ).astype(jnp.int8)
    return w_i8, scale.astype(jnp.float32)


def wq_matmul_xla(x, w_i8, scale) -> jax.Array:
    """Dequantize-then-dot oracle: bf16 convert, f32 accumulate + scale,
    bf16 result.  Slower than bf16 on TPU (the convert materializes) —
    used on CPU, in tests, and as the kernel's numerical reference."""
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w_i8.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return (acc * scale[None, :].astype(jnp.float32)).astype(jnp.bfloat16)


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]                                  # [B, K] bf16, resident
    w = w_ref[...].astype(jnp.bfloat16)             # int8 -> bf16 in VMEM
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wq_matmul(x, w_i8, scale, interpret: bool = False) -> jax.Array:
    """``x [B, K] bf16 @ dequant(w_i8 [K, N], scale [N]) -> [B, N] bf16``.

    B pads to the sublane multiple, N to the NT grid; K rides whole (the
    decoder's K is 1024/3072 — a [K, NT] int8 tile fits VMEM with room).
    """
    from jax.experimental import pallas as pl

    b, k = x.shape
    n = w_i8.shape[1]
    b_pad = -(-b // 16) * 16
    n_pad = -(-n // NT) * NT
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        w_i8 = jnp.pad(w_i8, ((0, 0), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n))
    s2 = scale.reshape(1, n_pad)  # 2-D: TPU vector layout wants lanes last

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // NT,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda i: (0, 0)),
            pl.BlockSpec((k, NT), lambda i: (0, i)),
            pl.BlockSpec((1, NT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b_pad, NT), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), jnp.bfloat16),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_i8, s2)
    return out[:b, :n]


def wq_matmul_auto(x, w_i8, scale) -> jax.Array:
    """Kernel on TPU, XLA oracle elsewhere (CPU tests / interpret-free)."""
    if jax.default_backend() in ("tpu", "axon"):
        return wq_matmul(x, w_i8, scale)
    return wq_matmul_xla(x, w_i8, scale)


def quantization_error(w, n_probe: int = 4096, seed: int = 0) -> dict:
    """Relative output error of int8 weight quantization at a matmul
    probe — the cheap offline quality signal (the WER delta needs the
    networked parity run)."""
    w = np.asarray(w, np.float32)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((min(n_probe, 4096), w.shape[0])).astype(
        np.float32
    )
    w_i8, scale = quantize_weight(w)
    ref = x @ w
    got = x @ (np.asarray(w_i8, np.float32) * np.asarray(scale)[None, :])
    denom = float(np.linalg.norm(ref)) or 1.0
    return {
        "rel_fro_error": float(np.linalg.norm(got - ref)) / denom,
        "max_abs_error": float(np.max(np.abs(got - ref))),
    }
