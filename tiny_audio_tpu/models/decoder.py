"""Qwen3-style causal language model in flax.linen, TPU-first.

Re-designed equivalent of the reference's frozen text tower
(``AutoModelForCausalLM`` Qwen3-0.6B, ``/root/reference/tiny_audio/asr_modeling.py:239-254``)
as an explicit architecture: GQA + per-head QK RMSNorm + RoPE (NeoX layout)
+ SwiGLU + pre-LN RMSNorm, optionally tied embeddings.

TPU design choices:
- ``nn.scan`` over layers: one compiled block instead of 28, cutting compile
  time and letting XLA pipeline the layer loop.
- Static-shape KV cache ``[L, B, max_len, Hkv, D]`` updated with
  ``dynamic_update_slice``; decode step is a single fused graph.
- bf16 params/compute with fp32 softmax/norm statistics.

Weight conversion from HF Qwen3 checkpoints: :func:`convert_hf_qwen3`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.config import DecoderConfig
from tiny_audio_tpu.models.layers import (
    RMSNorm,
    apply_rotary,
    rms_norm,
    rotary_embed,
)


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-entry symmetric int8 quantization over the head dim.

    x: [..., D] bf16/f32 -> (int8 [..., D], f32 scale [...]).
    Halves KV-cache bandwidth/memory at ~0.4% RMS error per entry
    (serving opt-in: DecoderConfig.kv_cache_dtype="int8").
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


class Qwen3Block(nn.Module):
    cfg: DecoderConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, layer_cache, cos, sin, padding_mask, step_kv_valid, cache_index):
        """One transformer block.

        x: [B, T, H] hidden states.  layer_cache: None or (k, v) each
        [B, S, Hkv, D].  Attention mode is shape-driven:
        no cache -> causal training forward (``padding_mask`` [B, T]);
        cache and T > 1 -> prefill (causal over the fresh K/V);
        cache and T == 1 -> decode step: stale cache (``step_kv_valid``
        [B, S] marking positions < cache_index) + fresh self position.

        Returns (x_out, fresh_kv): the block never writes the cache — the
        decoder performs ONE ``dynamic_update_slice`` per step outside the
        layer scan (a per-layer write would restack the full cache as scan
        outputs, a ~550 MB copy every decode step on the 0.6B model).
        """
        cfg = self.cfg
        b, t, _ = x.shape
        hd = cfg.head_dim

        def dense(h, feats, name):
            """Dense projection, plus a LoRA delta when enabled for this
            target.  LoRA A/B live NEXT TO the base kernel (paths
            ``{name}_lora_a``/``_b``) so base param paths — and therefore
            the HF weight converter and the mesh sharding rules — are
            unchanged whether LoRA is on or off.

            Decode steps (T==1) with a ``wq`` variables collection read
            int8 weights instead: W8A8 (``{name}_t_i8``, int8 x int8
            through XLA's native dot off a [N, K]-transposed weight —
            measured 20% faster than the bf16 matvec at these shapes,
            scripts/bench_w8a8_decode.py) takes precedence over
            weight-only (``{name}_i8``, the in-VMEM-dequant Pallas
            kernel, ops/wq_matmul.py — measured SLOWER than bf16 on this
            chip, kept opt-in for the record).  Prefill and training
            always use the bf16 kernels — they are compute-bound and the
            quantization would only cost accuracy there."""
            if t == 1 and self.has_variable("wq", f"{name}_t_i8"):
                from tiny_audio_tpu.ops.wq_head import w8a8_matmul_xla

                y = w8a8_matmul_xla(
                    h[:, 0].astype(jnp.bfloat16),
                    self.get_variable("wq", f"{name}_t_i8"),
                    self.get_variable("wq", f"{name}_t_scale"),
                )[:, None].astype(self.dtype)
            elif t == 1 and self.has_variable("wq", f"{name}_i8"):
                from tiny_audio_tpu.ops.wq_matmul import wq_matmul_auto

                y = wq_matmul_auto(
                    h[:, 0].astype(jnp.bfloat16),
                    self.get_variable("wq", f"{name}_i8"),
                    self.get_variable("wq", f"{name}_scale"),
                )[:, None].astype(self.dtype)
            else:
                y = nn.Dense(
                    feats, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=name,
                )(h)
            if cfg.lora_rank > 0 and name in cfg.lora_targets:
                a = self.param(
                    f"{name}_lora_a", nn.initializers.normal(0.02),
                    (h.shape[-1], cfg.lora_rank), jnp.float32,
                )
                bmat = self.param(
                    f"{name}_lora_b", nn.initializers.zeros,
                    (cfg.lora_rank, feats), jnp.float32,
                )
                scale = cfg.lora_alpha / cfg.lora_rank
                delta = (h.astype(jnp.float32) @ a) @ bmat * scale
                y = y + delta.astype(y.dtype)
            return y

        norm_offset = 1.0 if cfg.rms_norm_offset else 0.0
        residual = x
        x = RMSNorm(cfg.rms_norm_eps, jnp.float32, offset=norm_offset,
                    name="input_layernorm")(x)

        q = dense(x, cfg.num_heads * hd, "q_proj").reshape(b, t, cfg.num_heads, hd)
        k = dense(x, cfg.num_kv_heads * hd, "k_proj").reshape(b, t, cfg.num_kv_heads, hd)
        v = dense(x, cfg.num_kv_heads * hd, "v_proj").reshape(b, t, cfg.num_kv_heads, hd)

        # Per-head QK RMSNorm (Qwen3 signature feature; absent in the
        # Llama/SmolLM2 family, cfg.qk_norm=False), then RoPE
        if cfg.qk_norm:
            q_norm_w = self.param("q_norm", nn.initializers.ones, (hd,), jnp.float32)
            k_norm_w = self.param("k_norm", nn.initializers.ones, (hd,), jnp.float32)
            q = rms_norm(q, q_norm_w, cfg.rms_norm_eps)
            k = rms_norm(k, k_norm_w, cfg.rms_norm_eps)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        from tiny_audio_tpu.ops.attention import (
            causal_self_attention,
            decode_step_attention,
        )

        if layer_cache is not None:
            cache_k, cache_v = layer_cache[0], layer_cache[1]
            scales = layer_cache[2:] if len(layer_cache) > 2 else (None, None)
            new_cache = (k.astype(self.dtype), v.astype(self.dtype))
            if t == 1:  # decode step: stale cache + fresh self position
                out = decode_step_attention(
                    q, cache_k, cache_v, step_kv_valid, fresh_k=k, fresh_v=v,
                    k_scale=scales[0], v_scale=scales[1],
                    kv_len=cache_index,  # scalar -> TPU length-aware kernel
                )
            else:  # prefill: causal attention over the fresh K/V only
                out = causal_self_attention(q, k, v, padding_mask)
        else:
            new_cache = None
            out = causal_self_attention(q, k, v, padding_mask)
        x = dense(out.reshape(b, t, -1), cfg.hidden_size, "o_proj")
        x = residual + x

        residual = x
        x = RMSNorm(cfg.rms_norm_eps, jnp.float32, offset=norm_offset,
                    name="post_attention_layernorm")(x)
        gate = dense(x, cfg.intermediate_size, "gate_proj")
        up = dense(x, cfg.intermediate_size, "up_proj")
        # SwiGLU (qwen3/llama) vs GeGLU with the tanh approximation
        # (gemma's gelu_pytorch_tanh)
        act = (jax.nn.silu if cfg.hidden_activation == "silu"
               else lambda g: jax.nn.gelu(g, approximate=True))
        x = dense(act(gate) * up, cfg.hidden_size, "down_proj")
        return residual + x, new_cache


class Qwen3Decoder(nn.Module):
    """Causal LM.  Call modes:

    - full forward (training / no cache): ``cache=None`` -> (logits, None)
    - prefill: pass zero-initialized cache, ``cache_index=0`` -> cache filled
    - decode: T==1, ``cache_index=<current len>``
    """

    cfg: DecoderConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="embed_tokens",
        )
        block_cls = Qwen3Block
        if cfg.gradient_checkpointing:
            # rematerialize block activations in the backward pass
            # (reference gradient_checkpointing, asr_modeling.py:359-370)
            block_cls = nn.remat(
                Qwen3Block,
                static_argnums=(),
                prevent_cse=False,
            )
        block = nn.scan(
            block_cls,
            variable_axes={"params": 0, "wq": 0},  # wq: stacked int8 weights
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
        )
        self.layers = block(cfg, self.dtype, self.param_dtype, name="layers")
        self.norm = RMSNorm(
            cfg.rms_norm_eps, jnp.float32,
            offset=1.0 if cfg.rms_norm_offset else 0.0, name="norm",
        )
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="lm_head",
            )

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        inputs_embeds: jax.Array,
        positions: jax.Array,
        padding_mask: Optional[jax.Array] = None,
        step_kv_valid: Optional[jax.Array] = None,
        cache: Optional[dict] = None,
        cache_index: int | jax.Array = 0,
        return_hidden: bool = False,
        last_logit_only: bool = False,
        last_logit_index: Optional[jax.Array] = None,
    ):
        """``last_logit_only`` computes the LM head on the final position
        only (the prefill callers in ``generation.py`` discard every other
        row).  Measured at the serving shape (B32 x 470 prompt tokens x
        151k vocab): XLA's slice-of-dot simplification already elides the
        full-prompt head through the downstream ``logits[:, -1]`` (201 ms
        either way), so this is a compile-time guarantee of that elision —
        the ~4.6 TFLOP matmul + ~4.5 GB logits write must never come back —
        not a measured speedup.

        ``last_logit_index`` (traced scalar) selects THAT row instead of
        the last one — the bucketed-prompt prefill path, where real rows
        end at the traced prompt length and the tail is padding."""
        cfg = self.cfg
        cos, sin = rotary_embed(positions, cfg.head_dim, cfg.rope_theta)
        x = inputs_embeds.astype(self.dtype)
        if cfg.embedding_normalizer:
            # Gemma scales inputs_embeds by sqrt(hidden) INSIDE the model
            # forward (applied to user-passed embeds too), with the scalar
            # cast to the compute dtype first — spliced audio embeddings
            # therefore get the same treatment as token rows, matching what
            # HF would do to a reference-style inputs_embeds call.
            x = x * jnp.asarray(cfg.hidden_size ** 0.5, self.dtype)

        layer_cache = None
        if cache is not None:
            if "k_scale" in cache:
                layer_cache = (
                    cache["k"], cache["v"], cache["k_scale"], cache["v_scale"]
                )
            else:
                layer_cache = (cache["k"], cache["v"])
        # Per-row cache_index ([B] array, continuous batching) cannot feed
        # the length-aware Pallas decode kernel's scalar kv_len — pass None
        # so attention takes the masked XLA path (the production default).
        per_row_index = getattr(cache_index, "ndim", 0) == 1
        x, fresh_kv = self.layers(
            x, layer_cache, cos, sin, padding_mask, step_kv_valid,
            None if per_row_index else cache_index,
        )
        x = self.norm(x)
        if last_logit_index is not None:
            x = jax.lax.dynamic_slice_in_dim(x, last_logit_index, 1, axis=1)
        elif last_logit_only:
            x = x[:, -1:]
        if return_hidden:
            logits = None
        elif x.shape[1] == 1 and self.has_variable("wq", "head_t_i8"):
            # W8A8 head: native int8 x int8 MXU dot off the transposed
            # int8 head — the only int8 head variant measured FASTER than
            # the bf16 dot on this chip (0.730 vs 0.941 ms at B=48;
            # ops/wq_head.py).  Takes precedence over the weight-only
            # head_i8 path when both collections are present.
            from tiny_audio_tpu.ops.wq_head import w8a8_matmul_auto

            logits = w8a8_matmul_auto(
                x[:, 0].astype(jnp.bfloat16),
                self.get_variable("wq", "head_t_i8"),
                self.get_variable("wq", "head_w8a8_scale"),
            )[:, None, :cfg.vocab_size]
        elif x.shape[1] == 1 and self.has_variable("wq", "head_i8"):
            # wq decode: the LM head is the single largest weight read per
            # step (~311 MB bf16 at the 151k vocab); single-position logits
            # (decode steps AND bucketed-prefill first tokens) go through
            # the int8 kernel so the whole greedy path is consistently
            # quantized.
            from tiny_audio_tpu.ops.wq_matmul import wq_matmul_auto

            logits = wq_matmul_auto(
                x[:, 0].astype(jnp.bfloat16),
                self.get_variable("wq", "head_i8"),
                self.get_variable("wq", "head_scale"),
            )[:, None, :cfg.vocab_size]  # head is pre-padded to the N tile
        elif cfg.tie_word_embeddings:
            logits = self.embed_tokens.attend(x)
        else:
            logits = self.lm_head(x)

        new_cache = None
        if cache is not None:
            # single write for all layers: fresh_kv is [L, B, T, Hkv, D]
            if per_row_index:
                # continuous-batching decode (T==1): each slot sits at its
                # own length, so the write is a scatter over (batch, seq)
                # instead of a scalar-index dynamic_update_slice.  Cost is
                # identical to the DUS (0.003 vs 0.002 ms/step at b48
                # serving shapes — each step writes only ~2.8 MB;
                # scripts/bench_scatter_write.py)
                rows = jnp.arange(fresh_kv[0].shape[1])

                def write(buf, val):  # buf [L,B,S,...], val [L,B,...]
                    return buf.at[:, rows, cache_index].set(
                        val[:, :, 0], unique_indices=True
                    )
            else:
                idx5 = (0, 0, cache_index, 0, 0)
                idx4 = (0, 0, cache_index, 0)

                def write(buf, val):
                    return jax.lax.dynamic_update_slice(
                        buf, val, idx5 if val.ndim == 5 else idx4
                    )
            if cfg.kv_cache_dtype == "int8":
                k_q, k_s = quantize_kv(fresh_kv[0])
                v_q, v_s = quantize_kv(fresh_kv[1])
                new_cache = {
                    "k": write(cache["k"], k_q),
                    "v": write(cache["v"], v_q),
                    "k_scale": write(cache["k_scale"], k_s),
                    "v_scale": write(cache["v_scale"], v_s),
                }
            else:
                new_cache = {
                    "k": write(cache["k"], fresh_kv[0]),
                    "v": write(cache["v"], fresh_kv[1]),
                }
        return (logits if logits is not None else x), new_cache

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
        cfg = self.cfg
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        if cfg.kv_cache_dtype == "int8":
            return {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:-1], jnp.float32),
                "v_scale": jnp.zeros(shape[:-1], jnp.float32),
            }
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def quantize_decoder_wq(params: dict, cfg: DecoderConfig) -> dict:
    """Build the ``wq`` variables collection from decoder params: per-layer
    stacked int8 kernels + per-output-channel scales for every block
    projection, plus the LM head (the embedding transpose when tied).

    The bf16 params stay untouched — prefill/training keep full precision;
    only T==1 decode reads this collection (Qwen3Block.dense).  Memory:
    ~half the decoder weights again (int8 + f32 scales) — the trade for
    halving decode's per-step HBM traffic.
    """
    from tiny_audio_tpu.ops.wq_matmul import quantize_weight

    layers = params["layers"]
    wq_layers = {}
    for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj"):
        kern = layers[name]["kernel"]  # [L, K, N]
        i8, scale = jax.vmap(quantize_weight)(kern)
        wq_layers[f"{name}_i8"] = i8
        wq_layers[f"{name}_scale"] = scale
    head = (params["embed_tokens"]["embedding"].T
            if cfg.tie_word_embeddings else params["lm_head"]["kernel"])
    head_i8, head_scale = quantize_weight(head)
    # Pre-pad the ragged vocab dim to the kernel's N tile HERE: otherwise
    # wq_matmul's in-graph jnp.pad keeps a second full copy of the ~152 MB
    # int8 head resident (or worse, re-pads per decode step), eroding the
    # bandwidth win.  The head consumer slices logits back to vocab_size;
    # pad scales are zero so pad columns carry exactly-zero logits.
    from tiny_audio_tpu.ops.wq_matmul import NT

    v = head_i8.shape[1]
    v_pad = -(-v // NT) * NT
    if v_pad != v:
        head_i8 = jnp.pad(head_i8, ((0, 0), (0, v_pad - v)))
        head_scale = jnp.pad(head_scale, (0, v_pad - v))
    return {"layers": wq_layers,
            "head_i8": head_i8, "head_scale": head_scale}


def quantize_decoder_w8a8(params: dict, cfg: DecoderConfig) -> dict:
    """Build the W8A8 ``wq`` variables collection: per-layer stacked
    TRANSPOSED int8 kernels (``{name}_t_i8`` [L, N, K]) + per-output-channel
    scales for every block projection, plus the W8A8 head.

    T==1 decode then runs native int8 x int8 MXU dots (Qwen3Block.dense /
    the head dispatch in ``Qwen3Decoder.__call__``); prefill, training and
    beams keep the untouched bf16 params.  Measured on this chip
    (scripts/bench_w8a8_decode.py / bench_wq_head.py): layer matmuls
    2.162 vs 2.707 ms/step, head 0.730 vs 0.941 ms — the weight bytes
    halve and, unlike weight-only int8, no dequant convert sits on the
    critical path.  Numerics: activations quantize per-row to int8 too —
    a real quality trade, so this is serving opt-in, never a default.
    """
    from tiny_audio_tpu.ops.wq_head import (
        quantize_head_w8a8,
        quantize_weight_w8a8,
    )

    layers = params["layers"]
    wq_layers = {}
    for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj"):
        kern = layers[name]["kernel"]  # [L, K, N]
        t_i8, scale = jax.vmap(quantize_weight_w8a8)(kern)
        wq_layers[f"{name}_t_i8"] = t_i8
        wq_layers[f"{name}_t_scale"] = scale
    head = (params["embed_tokens"]["embedding"].T
            if cfg.tie_word_embeddings else params["lm_head"]["kernel"])
    head_t_i8, head_scale = quantize_head_w8a8(head)
    return {"layers": wq_layers,
            "head_t_i8": head_t_i8, "head_w8a8_scale": head_scale}


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------


def convert_hf_qwen3(state_dict: dict, cfg: DecoderConfig, dtype=jnp.bfloat16) -> dict:
    """Convert an HF causal-LM state_dict (torch or numpy tensors) to this
    module's parameter pytree (layers stacked for ``nn.scan``).

    Covers Qwen3ForCausalLM and, with ``cfg.qk_norm=False``, the
    Llama-family layout (LlamaForCausalLM / SmolLM2 / Mistral) — identical
    key naming minus the per-head ``q_norm``/``k_norm`` weights — and the
    Gemma-v1 layout (same keys again; the (1+w) norm convention, GeGLU and
    the sqrt(hidden) embed normalizer are runtime knobs on DecoderConfig,
    set by ``decoder_kwargs_from_hf``).  The reference accepts any
    AutoModelForCausalLM text tower (asr_modeling.py:239-254)."""

    def t(name, transpose=False, cast=None):
        w = state_dict[name]
        w = np.asarray(w.detach().cpu().float().numpy() if hasattr(w, "detach") else w)
        if transpose:
            w = w.T
        return jnp.asarray(w, dtype=cast or dtype)

    def stack(fmt, transpose=False, cast=None):
        return jnp.stack([t(fmt.format(i), transpose, cast) for i in range(cfg.num_layers)])

    p = "model."
    layers = {
        "input_layernorm": {"weight": stack(p + "layers.{}.input_layernorm.weight", cast=jnp.float32)},
        "post_attention_layernorm": {
            "weight": stack(p + "layers.{}.post_attention_layernorm.weight", cast=jnp.float32)
        },
        "q_proj": {"kernel": stack(p + "layers.{}.self_attn.q_proj.weight", transpose=True)},
        "k_proj": {"kernel": stack(p + "layers.{}.self_attn.k_proj.weight", transpose=True)},
        "v_proj": {"kernel": stack(p + "layers.{}.self_attn.v_proj.weight", transpose=True)},
        "o_proj": {"kernel": stack(p + "layers.{}.self_attn.o_proj.weight", transpose=True)},
        "gate_proj": {"kernel": stack(p + "layers.{}.mlp.gate_proj.weight", transpose=True)},
        "up_proj": {"kernel": stack(p + "layers.{}.mlp.up_proj.weight", transpose=True)},
        "down_proj": {"kernel": stack(p + "layers.{}.mlp.down_proj.weight", transpose=True)},
    }
    if cfg.qk_norm:
        layers["q_norm"] = stack(p + "layers.{}.self_attn.q_norm.weight",
                                 cast=jnp.float32)
        layers["k_norm"] = stack(p + "layers.{}.self_attn.k_norm.weight",
                                 cast=jnp.float32)
    params = {
        "embed_tokens": {"embedding": t(p + "embed_tokens.weight")},
        "layers": layers,
        "norm": {"weight": t(p + "norm.weight", cast=jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": t("lm_head.weight", transpose=True)}
    return params
