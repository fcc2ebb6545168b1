"""W8A8 int8 LM-head matmul: native int8 x int8 MXU dot off a transposed
weight.

Round 4 parked weight-only int8 decode because the in-kernel int8->bf16
dequant serializes against the MXU dot (~117-121 GB/s effective vs the
bf16 dot's HBM rate; docs/performance.md "Weight-only int8 decode").  This
kernel removes the convert instead of pipelining around it:

- the ACTIVATION is quantized per-row to int8 (dynamic, one cheap pass
  over [B, K] outside the kernel), so the MXU runs a NATIVE
  int8 x int8 -> int32 dot — v5e's MXU has 2x int8 throughput and no VPU
  convert sits on the critical path;
- the weight is stored TRANSPOSED, [N, K] int8: each (NT, K) grid tile is
  one fully contiguous HBM block (NT*K bytes) instead of K strided runs of
  NT bytes, so Mosaic's automatic pipeline issues long-burst DMAs
  (measured: [N, K] layout 0.730 ms vs [K, N] 0.813-0.919 ms at the
  151k-vocab head shape);
- both scales fold into the f32 epilogue:
  ``out = (x_i8 @ w_i8^T) * sx[b] * sw[n]``.

Measured on v5e at the decode-hot shape (B=48, K=1024, N=151936,
scripts/bench_wq_head.py): **0.730 ms vs the bf16 dot's 0.941 ms** in the
same harness — the first int8 head variant to beat bf16 on this chip
(weight-only int8: 1.281 ms; manual double-buffered dequant pipe:
0.787 ms).

Numerics are W8A8 — per-channel int8 weights AND per-row int8
activations — a real quality trade (greedy-argmax agreement vs bf16 was
0.958 on random weights; trained checkpoints have larger logit margins,
but proving WER-neutrality needs the networked parity run, PARITY.md).
Opt-in via ``ASRModel.enable_w8a8_head()`` / ``TA_W8A8_HEAD=1``, never a
silent default.

The reference serves an unquantized fp16/bf16 torch LM head
(/root/reference/tiny_audio/asr_modeling.py:634-640); this is TPU-serving
bandwidth machinery with no reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NT_HEAD = 2048  # output-channel tile: (2048, K<=3072) int8 tile <= 6 MB


def quantize_head_w8a8(head) -> tuple[jax.Array, jax.Array]:
    """Quantize an LM head ``[K, N]`` for the W8A8 kernel.

    Returns ``(wt_i8 [N_pad, K] int8, scale [N_pad] f32)`` — transposed
    storage (contiguous per-tile HBM reads) with N padded to the kernel's
    tile so no in-graph padding of the ~150 MB tensor survives per step.
    Pad rows carry zero scale -> exactly-zero logits; consumers slice back
    to vocab_size anyway.
    """
    head = jnp.asarray(head)
    scale = jnp.max(jnp.abs(head.astype(jnp.float32)), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_i8 = jnp.clip(
        jnp.round(head.astype(jnp.float32) / scale[None, :]), -127, 127
    ).astype(jnp.int8)
    wt_i8 = w_i8.T  # [N, K]
    n = wt_i8.shape[0]
    n_pad = -(-n // NT_HEAD) * NT_HEAD
    if n_pad != n:
        wt_i8 = jnp.pad(wt_i8, ((0, n_pad - n), (0, 0)))
        scale = jnp.pad(scale, (0, n_pad - n))
    return wt_i8, scale.astype(jnp.float32)


def quantize_weight_w8a8(w) -> tuple[jax.Array, jax.Array]:
    """Quantize a layer projection ``[K, N]`` for the W8A8 XLA path:
    per-output-channel symmetric int8, stored TRANSPOSED ``[N, K]``.

    Unlike :func:`quantize_head_w8a8` there is no tile padding — layer
    projection widths (1024/2048/3072) are already lane-aligned, and the
    consumer is XLA's own int8 ``dot_general`` (measured FASTER than the
    Pallas grid at these small-N shapes: scripts/bench_w8a8_decode.py),
    not the tiled head kernel.
    """
    w = jnp.asarray(w)
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_i8 = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[None, :]), -127, 127
    ).astype(jnp.int8)
    return w_i8.T, scale.astype(jnp.float32)


def quantize_act(x) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: ``x [B, K] -> (x_i8 [B, K], sx [B, 1] f32)``."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = jnp.maximum(ax, 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8
    )
    return x_i8, sx


def _kernel(x_ref, s_ref, sx_ref, wt_ref, o_ref):
    # wt tile is [NT, K]: contract x's dim 1 with wt's dim 1 — native
    # int8 x int8 -> int32 on the MXU, scales in the f32 epilogue.
    acc = jax.lax.dot_general(
        x_ref[...], wt_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx_ref[...] * s_ref[...]
    o_ref[...] = out.astype(jnp.bfloat16)


def w8a8_matmul_xla(x, wt_i8, scale) -> jax.Array:
    """XLA oracle with IDENTICAL quantization semantics (int8 activation,
    int32 accumulate, f32 scales): CPU/test fallback and the kernel's
    numerical reference."""
    x_i8, sx = quantize_act(x)
    acc = jax.lax.dot_general(
        x_i8, wt_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * scale[None, :]).astype(
        jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def w8a8_matmul(x, wt_i8, scale, interpret: bool = False) -> jax.Array:
    """``x [B, K] -> [B, N_pad] bf16`` through the int8 MXU head kernel.

    ``wt_i8 [N_pad, K]`` / ``scale [N_pad]`` come from
    :func:`quantize_head_w8a8` (N_pad a NT_HEAD multiple).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, k = x.shape
    n = wt_i8.shape[0]
    b_pad = -(-b // 32) * 32  # int8 sublane tile
    x_i8, sx = quantize_act(x)
    if b_pad != b:
        x_i8 = jnp.pad(x_i8, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))
    s2 = scale.reshape(1, n)

    out = pl.pallas_call(
        _kernel,
        grid=(n // NT_HEAD,),
        in_specs=[
            pl.BlockSpec((b_pad, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT_HEAD), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NT_HEAD, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, NT_HEAD), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.bfloat16),
        interpret=interpret,
    )(x_i8, s2, sx, wt_i8)
    return out[:b]


def w8a8_matmul_auto(x, wt_i8, scale) -> jax.Array:
    """Kernel on TPU, XLA oracle elsewhere (CPU tests)."""
    if jax.default_backend() in ("tpu", "axon"):
        return w8a8_matmul(x, wt_i8, scale)
    return w8a8_matmul_xla(x, wt_i8, scale)
