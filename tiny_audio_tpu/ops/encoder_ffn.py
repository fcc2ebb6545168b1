"""Fused encoder FFN (fc1 -> tanh-GELU -> fc2) as a Pallas TPU kernel.

XLA runs the encoder MLP as three separate HBM-level ops: fc1 writes the
[B*T, ffn] intermediate (503 MB at the B32 serving shape), the GELU reads
and rewrites it, fc2 reads it back.  The measured cost is ~5.7 ms/layer of
GELU on top of ~6.5 ms of matmul (docs/performance.md "tanh-GELU under
bf16": 4.3 ms of that GELU is pure HBM traffic for the intermediate).

This kernel chains both matmuls through VMEM so the intermediate never
touches HBM: for each [BM, d] output tile it loops over ffn-dim blocks,
computing ``gelu(x @ W1[:, blk] + b1[blk]) @ W2[blk, :]`` and accumulating
into an fp32 VMEM scratch.  GELU runs on the [BM, BK] block in fp32
(slightly *tighter* numerics than the unfused bf16 path).

**Status: PARKED — measured and not dispatched.** At the flagship shape
the isolated unfused XLA path runs at 142 TFLOP/s (9.06 ms for the full
MLP; ~72% of the chip's bf16 peak *counting the GELU as zero FLOPs*) —
XLA overlaps the GELU + intermediate traffic far better than the
per-stage timing table suggested.  This kernel measures 9.98 ms at
BM=256 / 9.31 ms at BM=512 (two dependent per-block dots pipeline worse
than XLA's two full-size matmuls), i.e. a ~3% *loss*, with a 1.7x
accuracy gain (fp32 GELU: 3.4e-3 vs 5.8e-3 max rel error vs an fp64
oracle) that does not justify diverging numerics.  Kept because the
kernel is correct, tested, and the measurement is the documentation
(scripts/bench_encoder_ffn.py; docs/performance.md dead-ends table).
Unit parity: tests/test_encoder_ffn.py (interpret mode vs the naive
formula).  Differentiable via a custom VJP that recomputes through the
naive formula.

Reference analogue: the torch reference runs whisper/GLM encoder MLPs
through cuBLAS + eager GELU (/root/reference/tiny_audio/asr_modeling.py
encoder towers); this is the TPU-native fusion of the same computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BM = 512   # output rows per tile
BK = 512   # ffn columns per inner block


def _gelu_tanh_f32(h: jax.Array) -> jax.Array:
    """tanh-approx GELU in fp32 (the bf16 encoder's selected form)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))


def naive_ffn(x, w1, b1, w2, b2, dtype):
    """The unfused formula with nn.Dense's promotion semantics (operands
    cast to ``dtype`` before each matmul), tanh GELU — the kernel's
    numerical oracle and backward."""
    x = x.astype(dtype)
    h = x @ w1.astype(dtype) + b1.astype(dtype)
    g = _gelu_tanh_f32(h.astype(jnp.float32)).astype(dtype)
    return g @ w2.astype(dtype) + b2.astype(dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref, *, nk):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    g = _gelu_tanh_f32(h)
    part = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        acc_ref[...] = part + b2_ref[...].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[...] += part

    @pl.when(j == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def encoder_ffn_tpu(x, w1, b1, w2, b2, interpret: bool = False):
    """``gelu_tanh(x @ w1 + b1) @ w2 + b2`` with the intermediate kept in
    VMEM.  x: [M, D]; w1: [D, F]; w2: [F, D].  M must be a BM multiple and
    F a BK multiple (``fused_ffn_applicable`` + the caller's padding
    guarantee this)."""
    return _ffn_impl(x, w1, b1, w2, b2, interpret)


def _ffn_fwd(x, w1, b1, w2, b2, interpret):
    return _ffn_impl(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _ffn_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: naive_ffn(*a, dtype=x.dtype), x, w1, b1, w2, b2
    )
    return vjp(g)


encoder_ffn_tpu.defvjp(_ffn_fwd, _ffn_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_impl(x, w1, b1, w2, b2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = x.shape
    f = w1.shape[1]
    assert m % BM == 0 and f % BK == 0, (m, f)
    nk = f // BK

    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(m // BM, nk),
        in_specs=[
            pl.BlockSpec((BM, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, d), jnp.float32)],
        interpret=interpret,
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def fused_ffn_applicable(d_model: int, ffn_dim: int) -> bool:
    """Shape gate: ffn blocks must tile BK and d_model must be lane-aligned
    (tiny test configs fall back to the unfused formula)."""
    return ffn_dim % BK == 0 and d_model % 128 == 0


def fused_ffn(x, w1, b1, w2, b2, dtype):
    """[B, T, D] -> [B, T, D] through the fused kernel, padding B*T up to a
    BM multiple (padded rows compute gelu(b1) @ w2 garbage and are sliced
    off)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    m = x2.shape[0]
    m_pad = -(-m // BM) * BM
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    out = encoder_ffn_tpu(
        x2.astype(dtype), w1.astype(dtype), b1.astype(dtype),
        w2.astype(dtype), b2.astype(dtype),
    )
    return out[:m].reshape(shape)
