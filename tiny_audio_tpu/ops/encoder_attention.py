"""Layout-native Pallas attention kernel for the audio encoder.

The library flash kernel wants [B, H, T, D] head-major inputs; the encoder's
activations are [B, T, H*D], so every layer pays 4 HBM transposes around the
kernel, and at head_dim 64 the online-softmax machinery is VPU-bound.  This
kernel instead:

- consumes q/k/v exactly as the QKV projection produces them
  ([B, T, H*D]) — zero layout changes;
- computes the full [BQ, T] score tile in VMEM with a single
  constant-shift softmax (the encoder's 1536-frame window fits; no
  online-softmax running stats, no per-row max pass) and folds the
  normalizing divide into the [BQ, D] output;
- grids over (batch, head-groups, q-tiles) with HG heads per program to
  stay under the VMEM budget.

Measured on v5e (32-layer GLM-ASR-class encoder): B=8 x 1536 frames
191 ms with the library flash kernel -> 164 ms (attention portion
93 -> 66 ms); the constant-shift + folded-divide softmax then cuts the
per-layer kernel 7.24 -> 5.63 ms at B=32 (scripts/
bench_encoder_attention.py, fp64-oracle parity table).  Dispatched from
:func:`tiny_audio_tpu.ops.attention.encoder_self_attention` on TPU; the
XLA naive path remains the CPU/test fallback and the numerical oracle
(tests/test_encoder_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tiny_audio_tpu.models.layers import MASK_VALUE

BQ = 256          # q rows per program
# Checked against the REAL ~16 MB/core VMEM with double-buffering modeled
# explicitly (below), not a halved hand-wavy budget: the flagship 20-head
# d64 config must keep heads-per-group 10 (measured fast path), while a
# 16-head d64 config must reject hg=16 (whose buffered need is ~17 MB).
VMEM_BUDGET = 15 * 1024 * 1024


def _heads_per_group(t_pad: int, d: int, h: int) -> int:
    """Largest divisor of ``h`` whose K/V/Q/O tiles + score tile fit VMEM.

    Blocked operands count TWICE: Mosaic double-buffers input/output blocks
    for pipelining, so an estimate that ignores it can select a head count
    that compiles over the real 16 MB limit instead of falling back to the
    next divisor (e.g. 16 heads x d64 at t_pad 1536 estimated 9.7 MB but
    needs ~16 MB buffered)."""
    for hg in range(h, 0, -1):
        if h % hg:
            continue
        kv_bytes = 2 * (2 * t_pad * hg * d * 2)        # k + v bf16, 2x buffered
        qo_bytes = 2 * (2 * BQ * hg * d * 2)           # q + out, 2x buffered
        score_bytes = BQ * t_pad * 4 + BQ * t_pad * 2  # fp32 s + bf16 p scratch
        if kv_bytes + qo_bytes + score_bytes < VMEM_BUDGET:
            return hg
    return 1


# Constant-shift softmax domain (see _kernel): exact softmax whenever a
# row's true max score lies in [SOFTMAX_SHIFT - 87, SOFTMAX_CLAMP] — the
# low end is fp32 exp underflow (e^-87), the high end the overflow clamp.
# Encoder scores are LayerNorm'd q·k/sqrt(d), observed |s| <~ 30 on real
# checkpoints; the window carries >4x margin on both sides.  Outside it the
# kernel degrades gracefully: rows above the clamp flatten toward the
# clamped entries, rows fully below the window return 0 (denominator
# guard), never NaN/Inf.
SOFTMAX_SHIFT = 48.0
SOFTMAX_CLAMP = 80.0


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, hg: int, d: int):
    mask = mask_ref[0] > 0  # [1, T]
    for h in range(hg):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (d ** -0.5)
        s = jnp.where(mask, s, MASK_VALUE)
        # Constant-shift softmax with the divide folded into the output:
        # exp(min(s, CLAMP) - SHIFT) is pure elementwise (no per-row max
        # reduce, no [BQ, 1] -> [BQ, T] broadcast), and normalizing the
        # [BQ, d] output instead of the [BQ, T] probability tile divides
        # T/d = 24x fewer elements.  Measured 7.24 -> 5.63 ms/layer-call
        # (B=32, T=1536, hg=10) with max error vs an fp64 oracle of
        # 1.49e-3 vs the fp32-softmax version's 1.39e-3 — both dominated
        # by the bf16 cast of p.  Masked columns sit at MASK_VALUE and
        # underflow to exactly 0.  (A per-tile-max variant that would be
        # exact for any input crashes the Mosaic compiler at this shape;
        # see scripts/bench_encoder_attention.py.)
        p = jnp.exp(jnp.minimum(s, SOFTMAX_CLAMP) - SOFTMAX_SHIFT)
        denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _naive_packed(q, k, v, kv_mask, num_heads):
    """Reference formula on packed heads (the kernel's backward path) —
    delegates to the shared :func:`models.layers.attention` oracle so the
    two implementations cannot drift."""
    from tiny_audio_tpu.models.layers import attention as naive_attention

    b, t, packed = q.shape
    d = packed // num_heads
    qh, kh, vh = (x.reshape(b, t, num_heads, d) for x in (q, k, v))
    mask = kv_mask.astype(bool)[:, None, None, :]
    return naive_attention(qh, kh, vh, mask=mask).reshape(b, t, packed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def encoder_attention_tpu(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Bidirectional multi-head attention over packed heads.

    q/k/v: [B, T, H*D]; kv_mask: [B, T] (1 = real frame).
    Returns [B, T, H*D].  T is padded to a BQ multiple internally.

    Differentiable via a custom VJP that recomputes through the naive
    formula (the encoder is frozen in every recipe, so the backward is a
    correctness safety net, not a hot path).
    """
    return _encoder_attention_impl(q, k, v, kv_mask, num_heads, interpret)


def _attention_fwd(q, k, v, kv_mask, num_heads, interpret):
    out = _encoder_attention_impl(q, k, v, kv_mask, num_heads, interpret)
    return out, (q, k, v, kv_mask)


def _attention_bwd(num_heads, interpret, residuals, g):
    q, k, v, kv_mask = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _naive_packed(q, k, v, kv_mask, num_heads), q, k, v
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


encoder_attention_tpu.defvjp(_attention_fwd, _attention_bwd)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _encoder_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, packed = q.shape
    d = packed // num_heads
    t_pad = -(-t // BQ) * BQ
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, t_pad - t)))

    hg = _heads_per_group(t_pad, d, num_heads)
    hd = hg * d
    mask3 = kv_mask.astype(jnp.int32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, hg=hg, d=d),
        grid=(b, num_heads // hg, t_pad // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda b, g, i: (b, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda b, g, i: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda b, g, i: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda b, g, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda b, g, i: (b, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, packed), q.dtype),
        interpret=interpret,
    )(q, k, v, mask3)
    return out[:, :t]
