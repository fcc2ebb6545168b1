"""Shared building blocks: RMSNorm, rotary embeddings, attention.

Functional JAX ops + small linen modules used by the encoder, decoder and
projectors.  All attention math keeps softmax statistics in float32 even under
bf16 compute (matmuls use ``preferred_element_type=float32``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# Large-negative mask value; -0.7*float32_max avoids NaN from (-inf) - (-inf)
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float = 1e-6, offset: float = 0.0
) -> jax.Array:
    """RMSNorm with float32 statistics (LlamaRMSNorm semantics).

    ``offset=1.0`` selects the Gemma convention: weights are stored
    zero-centered and applied as ``(1 + w)``, with the cast back to the
    compute dtype AFTER the weight multiply — exactly GemmaRMSNorm."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * (offset + weight.astype(jnp.float32))).astype(dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32
    offset: float = 0.0  # 1.0 = Gemma zero-centered weights, applied as 1+w

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.offset else nn.initializers.ones
        weight = self.param(
            "weight", init, (x.shape[-1],), self.param_dtype
        )
        return rms_norm(x, weight, self.eps, self.offset)


def rotary_embed(positions: jax.Array, head_dim: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """(cos, sin) tables for the given positions, NeoX half-rotation layout.

    positions: [B, T] int32 -> cos/sin [B, T, head_dim//2] float32.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding.  x: [B, T, H, D]; cos/sin: [B, T, D//2]."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head attention with GQA support and fp32 softmax.

    q: [B, Tq, Hq, D];  k, v: [B, Tk, Hkv, D];  mask: broadcastable to
    [B, Hq, Tq, Tk] (True = attend).  Returns [B, Tq, Hq, D].
    """
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    group = hq // hkv

    qg = q.reshape(b, tq, hkv, group, d)
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        m = mask
        if m.ndim == 2:  # [B, Tk] padding mask
            m = m[:, None, None, None, :]
        else:
            # honor the documented contract for EVERY broadcastable shape
            # ([B,Tq,Tk], [1,Hq,Tq,Tk], ...) — ad-hoc ndim branches silently
            # mis-aligned axes for shapes outside the common cases
            if m.ndim == 3:  # [B, Tq, Tk]
                m = m[:, None]
            if m.shape[1] == 1:  # head-broadcast: no per-head materialization
                m = m[:, :, None]  # [B|1, 1, 1, Tq, Tk]
            else:
                m = jnp.broadcast_to(m, (b, hq, tq, m.shape[-1]))
                m = m.reshape(b, hkv, group, tq, -1)
        scores = jnp.where(m, scores, MASK_VALUE)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def sinusoidal_positions(length: int, dim: int) -> jax.Array:
    """Whisper-style sinusoidal position table [length, dim] (float32)."""
    log_timescale = jnp.log(10000.0) / (dim // 2 - 1)
    inv_timescales = jnp.exp(-log_timescale * jnp.arange(dim // 2, dtype=jnp.float32))
    scaled = jnp.arange(length, dtype=jnp.float32)[:, None] * inv_timescales[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
