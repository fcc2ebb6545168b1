"""Decode step with in-kernel cache ownership (the round-2 decode path).

The round-1 measurement (docs/performance.md) showed the length-aware Pallas
decode-attention kernel wins ~1.8x in isolation but loses end-to-end: with
the KV cache updated by an XLA ``dynamic_update_slice`` and READ by a Pallas
custom call, XLA inserts a defensive full-cache copy every step.  The fix is
ownership: ONE kernel per layer (:func:`~tiny_audio_tpu.ops.decode_attention.
decode_attention_update_tpu`) both appends the fresh K/V row and computes the
step attention, with the cache buffers declared ``input_output_aliases`` and
threaded linearly scan-carry -> while-carry.  An alias probe measured flat
per-step time across cache sizes in that layout (no copy).

This module provides the pure per-step function used by
``generation.generate_tokens`` when ``TA_PALLAS_DECODE=2``: a ``lax.scan``
over the stacked layer parameters, mirroring ``Qwen3Block``'s decode math
exactly (pre-LN RMSNorm, per-head QK-norm, NeoX rope, GQA attention, SwiGLU)
— parity is pinned token-exact against the module path in
``tests/test_fused_decode.py`` and ``scripts/check_decode_kernel_parity.py``.

LoRA serving is out of scope here (merge adapters first); the caller gates on
``cfg.lora_rank == 0``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import DecoderConfig
from tiny_audio_tpu.models.layers import apply_rotary, rms_norm, rotary_embed
from tiny_audio_tpu.ops.decode_attention import decode_attention_update_tpu


def flatten_cache(cache: dict) -> dict:
    """[L, B, S, Hkv, D] module cache -> kernel-flat [L, B, S, Hkv*D]."""
    el, b, s, hkv, d = cache["k"].shape
    out = {
        "k": cache["k"].reshape(el, b, s, hkv * d),
        "v": cache["v"].reshape(el, b, s, hkv * d),
    }
    if "k_scale" in cache:
        out["k_scale"] = cache["k_scale"]
        out["v_scale"] = cache["v_scale"]
    return out


def fused_decode_step(
    params: dict,
    cfg: DecoderConfig,
    cur: jax.Array,        # [B] int32 current token ids
    pos: jax.Array,        # scalar int32 position being fed (= cache write row)
    caches: dict,          # flat cache (flatten_cache), consumed linearly
    interpret: bool = False,
) -> tuple[jax.Array, dict]:
    """One decode step over all layers; returns (logits fp32 [B, V], caches).

    The caches MUST come from and return to a loop carry untouched by any
    other consumer — that linearity is what lets XLA keep the aliased kernel
    updates in place.
    """
    hd = cfg.head_dim
    hq, hkv = cfg.num_heads, cfg.num_kv_heads
    b = cur.shape[0]
    eps = cfg.rms_norm_eps
    quantized = "k_scale" in caches

    embed = params["embed_tokens"]["embedding"]
    x = embed[cur][:, None, :].astype(jnp.bfloat16)  # [B, 1, H]
    positions = jnp.full((b, 1), pos, jnp.int32)
    cos, sin = rotary_embed(positions, hd, cfg.rope_theta)

    if cfg.qk_norm:
        q_norm_stack = params["layers"]["q_norm"]
        k_norm_stack = params["layers"]["k_norm"]
    else:  # llama-family: no per-head QK norm; dummies keep the scan xs shape
        q_norm_stack = jnp.zeros((cfg.num_layers, 1), jnp.float32)
        k_norm_stack = q_norm_stack

    def layer(carry, xs):
        x, ck, cv, ks, vs = carry
        p, q_norm_w, k_norm_w, lidx = xs

        def w(name):  # cast like nn.Dense(dtype=bf16) casts its kernel
            return p[name]["kernel"].astype(x.dtype)

        h = rms_norm(x, p["input_layernorm"]["weight"], eps)
        q = (h @ w("q_proj")).reshape(b, 1, hq, hd)
        k = (h @ w("k_proj")).reshape(b, 1, hkv, hd)
        v = (h @ w("v_proj")).reshape(b, 1, hkv, hd)
        if cfg.qk_norm:
            q = rms_norm(q, q_norm_w, eps)
            k = rms_norm(k, k_norm_w, eps)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        if quantized:
            out, ck, cv, ks, vs = decode_attention_update_tpu(
                q[:, 0], ck, cv, k[:, 0], v[:, 0], pos, lidx,
                k_scale=ks, v_scale=vs, interpret=interpret,
            )
        else:
            out, ck, cv = decode_attention_update_tpu(
                q[:, 0], ck, cv, k[:, 0].astype(ck.dtype),
                v[:, 0].astype(cv.dtype), pos, lidx, interpret=interpret,
            )
        x = x + (out.reshape(b, 1, hq * hd).astype(x.dtype) @ w("o_proj"))

        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], eps)
        gate = h2 @ w("gate_proj")
        up = h2 @ w("up_proj")
        x = x + (jax.nn.silu(gate) * up) @ w("down_proj")
        return (x, ck, cv, ks, vs), ()

    layer_params = {
        name: sub for name, sub in params["layers"].items()
        if name not in ("q_norm", "k_norm")
    }
    dummy = jnp.zeros((1,), jnp.float32)
    carry0 = (
        x, caches["k"], caches["v"],
        caches.get("k_scale", dummy), caches.get("v_scale", dummy),
    )
    (x, ck, cv, ks, vs), _ = jax.lax.scan(
        layer, carry0,
        (layer_params, q_norm_stack, k_norm_stack,
         jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )

    x = rms_norm(x, params["norm"]["weight"], eps)
    # bf16 dots to match the module's nn.Embed.attend / nn.Dense numerics
    # (token parity is checked bit-exact against the module path)
    if cfg.tie_word_embeddings:
        logits = (x[:, 0] @ embed.astype(x.dtype).T).astype(jnp.float32)
    else:
        logits = (x[:, 0] @ params["lm_head"]["kernel"]).astype(jnp.float32)

    new_caches = {"k": ck, "v": cv}
    if quantized:
        new_caches["k_scale"] = ks
        new_caches["v_scale"] = vs
    return logits, new_caches
