"""Attention dispatch: Pallas flash attention on TPU, naive XLA elsewhere.

The hot attention shapes in this framework:

- encoder self-attention: [B, 1500, 20 heads, 64]  (30 s of audio)
- decoder prefill:        [B, ~400, 16/8 GQA heads, 128]
- decoder decode step:    q_len == 1 against a KV cache

For the first two the naive computation materializes [B, H, T, T] scores in
HBM — at batch 32 that alone is gigabytes and dominates bandwidth.  We
dispatch those to the tiled flash-attention kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) with segment-id padding
masks; the decode step stays a fused matvec over the cache (flash would waste
its tiling on q_len == 1; the paged-attention kernel is the round-2 upgrade).

All public entry points take [B, T, H, D] layout (time-major heads), matching
the model code, and handle GQA by repeating KV heads for the kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from tiny_audio_tpu.models import layers as _naive


def _platform() -> str:
    return jax.devices()[0].platform


def use_flash() -> bool:
    force = os.environ.get("TA_FORCE_FLASH")
    if force is not None:
        return force == "1"
    return _platform() == "tpu"


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def _block(t_pad: int) -> int:
    """Largest flash block size that DIVIDES the padded length — the kernel
    requires seq_len % block == 0, so min(512, t) crashes at padded lengths
    like 640/768/1152 (reproduced in review); t_pad is a 128-multiple, so
    128 always divides."""
    for b in (512, 256, 128):
        if t_pad % b == 0:
            return b
    return 128


@functools.partial(jax.jit, static_argnames=("causal", "scale"))
def _flash_call(q, k, v, q_seg, kv_seg, causal: bool, scale: float):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    t_q, t_k = q.shape[2], k.shape[2]
    block_q = _block(t_q)
    block_k = _block(t_k)
    sizes = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=1,
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_k,
        block_k_dkv=block_k,
        block_q_dkv=block_q,
        block_k_major_dq=block_k,
        block_k_dq=block_k,
        block_q_dq=block_q,
    )
    return flash_attention(
        q, k, v,
        segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
        causal=causal,
        sm_scale=scale,
        block_sizes=sizes,
    )


def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Flash attention over [B, T, H, D] inputs with padding masks.

    ``q_mask``/``kv_mask``: [B, T] 1 = real token.  GQA handled by repeating
    KV heads.  Sequences are zero-padded to a 128 multiple; padding carries
    segment id 0 vs 1 for real tokens, so it never mixes with real positions.
    """
    b, t_q, h_q, d = q.shape
    h_kv = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    if h_kv != h_q:
        k = jnp.repeat(k, h_q // h_kv, axis=2)
        v = jnp.repeat(v, h_q // h_kv, axis=2)

    # [B, T, H, D] -> [B, H, T, D]
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, 128)
    kt = _pad_to(k.transpose(0, 2, 1, 3), 2, 128)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, 128)
    t_qp, t_kp = qt.shape[2], kt.shape[2]

    if q_mask is None:
        q_mask = jnp.ones((b, t_q), jnp.int32)
    if kv_mask is None:
        kv_mask = jnp.ones((b, k.shape[1]), jnp.int32)
    q_seg = _pad_to(q_mask.astype(jnp.int32), 1, 128)[:, :t_qp]
    kv_seg = _pad_to(kv_mask.astype(jnp.int32), 1, 128)[:, :t_kp]

    out = _flash_call(qt, kt, vt, q_seg, kv_seg, causal, float(scale))
    return out[:, :, :t_q].transpose(0, 2, 1, 3).astype(q.dtype)


def causal_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Causal self-attention over fresh K/V (training forward and prefill)."""
    if use_flash():
        return flash_mha(q, k, v, q_mask=padding_mask, kv_mask=padding_mask, causal=True)
    t = q.shape[1]
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]
    if padding_mask is not None:
        mask = causal & padding_mask.astype(bool)[:, None, None, :]
    else:
        mask = jnp.broadcast_to(causal, (q.shape[0], 1, t, t))
    return _naive.attention(q, k, v, mask=mask)


def encoder_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Bidirectional self-attention with optional padding mask.

    On TPU this dispatches to the layout-native single-pass Pallas kernel
    (ops/encoder_attention.py, ~14% faster than the library flash kernel at
    the encoder's head_dim-64 shapes).  TA_FORCE_FLASH=1 forces the library
    flash kernel; TA_FORCE_FLASH=0 forces the naive XLA path (the on-device
    numerical oracle); unset uses the custom kernel.

    DOMAIN ASSUMPTION (TPU kernel only): the kernel's constant-shift softmax
    is exact only while every attention row's max score lies in
    ``[SOFTMAX_SHIFT - 87, SOFTMAX_CLAMP]`` = [-39, 80]
    (ops/encoder_attention.py).  This holds with >4x margin for the shipped
    checkpoint family (|s| <~ 30) and is VALIDATED AT IMPORT for every
    converted encoder (convert.convert_checkpoint ->
    debug.calibrate_attention_window; ``ta debug attn-window`` re-checks any
    checkpoint).  A checkpoint outside the window should set
    TA_FORCE_FLASH=1 to use the exact library kernel."""
    b, t, h, d = q.shape
    force = os.environ.get("TA_FORCE_FLASH")
    if _platform() == "tpu" and force is None:
        from tiny_audio_tpu.ops.encoder_attention import encoder_attention_tpu

        kv_mask = (
            padding_mask if padding_mask is not None
            else jnp.ones((b, t), jnp.int32)
        )
        out = encoder_attention_tpu(
            q.reshape(b, t, h * d), k.reshape(b, t, h * d),
            v.reshape(b, t, h * d), kv_mask, num_heads=h,
        )
        return out.reshape(b, t, h, d)
    if use_flash():
        return flash_mha(q, k, v, q_mask=padding_mask, kv_mask=padding_mask, causal=False)
    mask = None
    if padding_mask is not None:
        mask = padding_mask.astype(bool)[:, None, None, :]
    return _naive.attention(q, k, v, mask=mask)


def decode_step_attention(
    q: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    kv_valid: jax.Array,
    fresh_k: Optional[jax.Array] = None,
    fresh_v: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
) -> jax.Array:
    """q_len==1 attention over the KV cache.  kv_valid: [B, S] or [S].

    ``kv_len`` (scalar: number of valid cache positions, equal for all rows —
    the decode loops' ``cache_index``) enables the fused length-aware Pallas
    kernel (ops/decode_attention.py) via TA_PALLAS_DECODE=1.  The kernel wins
    in isolation (3.9 -> 2.1 ms per 28-layer step at S=512, kv_len=440, b32
    v5e: it skips HBM reads of the invalid cache tail) but is OPT-IN because
    inside the generate while_loop it costs more than it saves: XLA only
    keeps the carried KV cache update in-place for its own ops — any custom
    call reading the carry forces a full defensive cache copy per step
    (measured 3.7 -> 8.3 ms/step e2e; an aliased in-kernel updater made it
    16 ms/step).  docs/performance.md has the full measurement trail.

    CAVEAT: this function runs under jit, so the env var is read at TRACE
    time — set TA_PALLAS_DECODE=1 before the first call of a given shape;
    flipping it mid-process does not retrace cached graphs.  (The
    production-facing =2 fused path threads an explicit static flag from
    outside the jit instead — generation.generate_tokens.)

    When ``fresh_k``/``fresh_v`` ([B, 1, Hkv, D]) are given, the cache is
    treated as STALE at the current position: attention runs over the masked
    cache plus the fresh self position appended in score space.  This lets
    the caller write the cache ONCE per step outside the layer scan — the
    per-layer ``dynamic_update_slice`` + scan-output restack costs a full
    cache copy every decode step (measured 6.3 -> 3.8 ms/step on v5e for
    the 0.6B decoder, ~40%).

    ``k_scale``/``v_scale`` ([B, S, Hkv]): the cache holds per-entry-scaled
    int8 (DecoderConfig.kv_cache_dtype="int8"); scales fold into the score
    and probability tensors, so dequantization never materializes a bf16
    cache copy.
    """
    if kv_valid.ndim == 1:
        kv_valid = kv_valid[None, :]
    if fresh_k is None:
        mask = kv_valid.astype(bool)[:, None, None, :]
        return _naive.attention(q, cache_k, cache_v, mask=mask)

    if (
        kv_len is not None
        and _platform() == "tpu"
        and os.environ.get("TA_PALLAS_DECODE") == "1"
        and cache_k.shape[-1] == 128
        and cache_k.shape[1] % 8 == 0
        and q.shape[2] % cache_k.shape[2] == 0
    ):
        from tiny_audio_tpu.ops.decode_attention import decode_attention_tpu

        out = decode_attention_tpu(
            q[:, 0], cache_k, cache_v, fresh_k[:, 0], fresh_v[:, 0],
            kv_len, k_scale=k_scale, v_scale=v_scale,
        )
        return out[:, None].astype(q.dtype)

    b, _, hq, d = q.shape
    hkv = cache_k.shape[2]
    group = hq // hkv
    scale = d ** -0.5
    from tiny_audio_tpu.models.layers import MASK_VALUE

    compute_dtype = q.dtype
    qg = q.reshape(b, hkv, group, d)
    scores = jnp.einsum(
        "bhgd,bkhd->bhgk", qg, cache_k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_scale is not None:
        scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, :]
    scores = jnp.where(
        kv_valid.astype(bool)[:, None, None, :], scores, MASK_VALUE
    )
    self_score = jnp.einsum(
        "bhgd,bhd->bhg", qg, fresh_k.reshape(b, hkv, d),
        preferred_element_type=jnp.float32,
    )[..., None] * scale
    probs = jax.nn.softmax(
        jnp.concatenate([scores, self_score], axis=-1), axis=-1
    )
    cache_probs = probs[..., :-1]
    if v_scale is not None:  # fold dequant scale into the probabilities
        cache_probs = cache_probs * v_scale.transpose(0, 2, 1)[:, :, None, :]
    out = jnp.einsum(
        "bhgk,bkhd->bhgd", cache_probs.astype(compute_dtype),
        cache_v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    out = out + probs[..., -1:].astype(compute_dtype) * fresh_v.reshape(
        b, hkv, 1, d
    ).astype(compute_dtype)
    return out.reshape(b, 1, hq, d).astype(q.dtype)
