"""Audio projectors: the trainable encoder->LM bridge (all four variants).

Re-designed equivalents of ``/root/reference/tiny_audio/projectors.py``:

- :class:`MLPProjector`      (reference :23-71)   frame-stack k -> MLP
- :class:`MOSAProjector`     (reference :103-177)  dense-MoE, conv downsample
- :class:`MoEProjector`      (reference :185-351)  shared + top-k sparse experts
- :class:`QFormerProjector`  (reference :359-475)  BLIP-2/Granite window queries

TPU-first choices: the sparse MoE uses a *dense einsum dispatch* — with 4
tiny experts it is cheaper to run every expert on every token on the MXU and
mask by routing weight than to gather/scatter (the reference's
``index_add_`` path, :327-347, is a GPU idiom).  All projectors return
``(output, aux_loss)``; output-length formulas are exact integer ports and
work on both ints and arrays (used by the collator on length vectors).

Every projector is callable as ``proj(x, train=False)`` with
``x: [B, T, encoder_dim]`` returning ``[B, T', llm_dim]``.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import ASRConfig
from tiny_audio_tpu.models.layers import RMSNorm, attention


def frame_stack(x: jax.Array, k: int) -> jax.Array:
    """Stack k adjacent frames along features, truncating the remainder.

    [B, T, D] -> [B, (T - k)//k + 1, D*k]  (reference projectors.py:79-87).
    """
    b, t, d = x.shape
    out_len = (t - k) // k + 1
    return x[:, : out_len * k, :].reshape(b, out_len, d * k)


class MLPProjector(nn.Module):
    """Frame-stack + 2-layer MLP with RMS input/output norms."""

    cfg: ASRConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def get_output_length(self, input_length):
        k = self.cfg.projector_pool_stride
        return (input_length - k) // k + 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        hidden = cfg.projector_hidden_dim or cfg.llm_dim
        x = frame_stack(x, cfg.projector_pool_stride).astype(self.dtype)
        x = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_1")(x)
        x = RMSNorm(1e-6, self.param_dtype, name="norm")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.llm_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_2")(x)
        # Output norm aligns projector RMS with the LM embedding distribution
        # (reference projectors.py:46-50)
        x = RMSNorm(1e-6, self.param_dtype, name="norm_2")(x)
        return x, jnp.float32(0.0)


class SimpleAdapter(nn.Module):
    """2-layer GELU adapter (MOSA paper)."""

    hidden_dim: int
    output_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class MOSAProjector(nn.Module):
    """Dense mixture of simple adapters (arXiv:2508.18998), conv downsampler."""

    cfg: ASRConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    ADAPTER_HIDDEN_DIM: int = 4096
    ROUTER_HIDDEN_DIM: int = 512
    CONV_KERNEL: int = 3
    CONV_STRIDE: int = 2
    CONV_PADDING: int = 1

    def get_output_length(self, input_length):
        length = input_length
        for _ in range(2):
            length = (
                length + 2 * self.CONV_PADDING - self.CONV_KERNEL
            ) // self.CONV_STRIDE + 1
        return length

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        num_experts = cfg.num_experts or 4
        x = x.astype(self.dtype)

        for i, feats in enumerate([cfg.encoder_dim, cfg.llm_dim]):
            x = nn.Conv(
                feats,
                kernel_size=(self.CONV_KERNEL,),
                strides=(self.CONV_STRIDE,),
                padding=[(self.CONV_PADDING, self.CONV_PADDING)],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"downsample_{i}",
            )(x)
            x = nn.gelu(x, approximate=False)

        r = nn.Dense(self.ROUTER_HIDDEN_DIM, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="router_fc1")(x)
        r = nn.relu(r)
        logits = nn.Dense(num_experts, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="router_fc2")(r)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        # routing-health observability (ta debug check-mosa)
        self.sow("intermediates", "router_probs", weights.astype(jnp.float32))

        out = 0.0
        for e in range(num_experts):
            expert_out = SimpleAdapter(
                self.ADAPTER_HIDDEN_DIM, cfg.llm_dim, self.dtype,
                self.param_dtype, name=f"expert_{e}",
            )(x)
            out = out + expert_out * weights[..., e : e + 1]
        return out, jnp.float32(0.0)


class MoEProjector(nn.Module):
    """Shared expert + top-k sparse experts (DeepSeek-style) with load-balance
    and z losses.  Dense einsum dispatch (see module docstring)."""

    cfg: ASRConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def get_output_length(self, input_length):
        k = self.cfg.projector_pool_stride
        return (input_length - k) // k + 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        k_stride = cfg.projector_pool_stride
        num_experts = cfg.num_experts
        top_k = cfg.num_experts_per_tok
        in_dim = cfg.encoder_dim * k_stride
        out_dim = cfg.llm_dim
        hidden = cfg.projector_hidden_dim or out_dim

        x = frame_stack(x, k_stride)
        b, t, _ = x.shape
        x = RMSNorm(1e-6, self.param_dtype, name="norm")(x).astype(self.dtype)

        # Router with optional jitter noise (training-only, reference :294-299)
        logits = nn.Dense(num_experts, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="router")(x)
        logits = logits.astype(jnp.float32)
        if train and cfg.router_jitter_noise > 0:
            eps = cfg.router_jitter_noise
            noise = jax.random.uniform(
                self.make_rng("jitter"), logits.shape,
                minval=1.0 - eps, maxval=1.0 + eps,
            )
            logits = logits * noise

        probs = jax.nn.softmax(logits, axis=-1)  # fp32 softmax [B, T, E]
        # routing-health observability (ta debug check-moe)
        self.sow("intermediates", "router_probs", probs)
        top_w, top_idx = jax.lax.top_k(probs, top_k)
        top_w = top_w / (top_w.sum(axis=-1, keepdims=True) + 1e-6)

        # Dense routing-weight matrix: gate[b,t,e] = renormalized weight if
        # expert e selected, else 0  (exactly the sparse dispatch's semantics)
        one_hot = jax.nn.one_hot(top_idx, num_experts, dtype=jnp.float32)
        gate = jnp.einsum("btk,btke->bte", top_w, one_hot)

        shared = SimpleAdapter(hidden, out_dim, self.dtype, self.param_dtype,
                               name="shared_expert")(x)

        # Stacked expert weights -> two einsums on the MXU, no gather
        w1 = self.param("experts_fc1_kernel", nn.initializers.xavier_uniform(),
                        (num_experts, in_dim, hidden), self.param_dtype)
        b1 = self.param("experts_fc1_bias", nn.initializers.zeros,
                        (num_experts, hidden), self.param_dtype)
        w2 = self.param("experts_fc2_kernel",
                        nn.initializers.normal(stddev=0.01),
                        (num_experts, hidden, out_dim), self.param_dtype)
        b2 = self.param("experts_fc2_bias", nn.initializers.zeros,
                        (num_experts, out_dim), self.param_dtype)

        h = jnp.einsum("bti,eih->bteh", x, w1.astype(self.dtype),
                       preferred_element_type=jnp.float32).astype(self.dtype)
        h = nn.gelu(h + b1.astype(self.dtype)[None, None], approximate=False)
        eo = jnp.einsum("bteh,eho->bteo", h, w2.astype(self.dtype),
                        preferred_element_type=jnp.float32).astype(self.dtype)
        eo = eo + b2.astype(self.dtype)[None, None]
        sparse = jnp.einsum("bteo,bte->bto", eo, gate.astype(self.dtype))

        aux = jnp.float32(0.0)
        if train:
            # Load-balance loss: coef * N * mean((p_bar - 1/N)^2)  (ref :314-320)
            prob_per_expert = probs.reshape(-1, num_experts).mean(axis=0)
            target = 1.0 / num_experts
            balance = (
                cfg.router_aux_loss_coef
                * jnp.mean((prob_per_expert - target) ** 2)
                * num_experts
            )
            # Z-loss: penalize large router logits (ref :322-323)
            z = cfg.router_z_loss_coef * jnp.mean(
                jax.nn.logsumexp(logits, axis=-1) ** 2
            )
            aux = balance + z

        return shared + sparse, aux


class QFormerBlock(nn.Module):
    """BERT-style post-LN block: self-attn over queries, cross-attn to the
    window features, GELU FFN.  (BLIP-2 QFormer with query tokens only and
    cross_attention_frequency=1, reference :403-416.)"""

    hidden: int
    num_heads: int
    intermediate: int
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_states, enc_states, train: bool = False):
        hd = self.hidden // self.num_heads
        ln_eps = 1e-12

        def dense(feats, name):
            return nn.Dense(feats, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)

        def mha(queries, keys, prefix):
            b, tq, _ = queries.shape
            tk = keys.shape[1]
            q = dense(self.hidden, f"{prefix}_q")(queries).reshape(b, tq, self.num_heads, hd)
            k = dense(self.hidden, f"{prefix}_k")(keys).reshape(b, tk, self.num_heads, hd)
            v = dense(self.hidden, f"{prefix}_v")(keys).reshape(b, tk, self.num_heads, hd)
            out = attention(q, k, v).reshape(b, tq, self.hidden)
            out = dense(self.hidden, f"{prefix}_out")(out)
            return nn.Dropout(self.dropout, deterministic=not train)(out)

        q_states = nn.LayerNorm(epsilon=ln_eps, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="ln_self")(
            q_states + mha(q_states, q_states, "self")
        )
        q_states = nn.LayerNorm(epsilon=ln_eps, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="ln_cross")(
            q_states + mha(q_states, enc_states, "cross")
        )
        ffn = dense(self.intermediate, "ffn_in")(q_states)
        ffn = nn.gelu(ffn, approximate=False)
        ffn = dense(self.hidden, "ffn_out")(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=not train)(ffn)
        return nn.LayerNorm(epsilon=ln_eps, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="ln_ffn")(
            q_states + ffn
        )


class QFormerProjector(nn.Module):
    """Granite-style windowed QFormer with learnable queries."""

    cfg: ASRConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def num_queries(self) -> int:
        return self.cfg.qformer_window_size // self.cfg.downsample_rate

    def get_output_length(self, input_length):
        w = self.cfg.qformer_window_size
        nblocks = (input_length + w - 1) // w
        return nblocks * self.num_queries

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        window = cfg.qformer_window_size
        hidden = cfg.qformer_hidden_size or cfg.encoder_dim
        intermediate = cfg.qformer_intermediate_size or hidden * 4
        nq = self.num_queries

        b, t, d = x.shape
        x = x.astype(self.dtype)
        if d != hidden:
            x = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="encoder_proj")(x)

        nblocks = math.ceil(t / window)
        pad = nblocks * window - t
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(b * nblocks, window, hidden)

        query = self.param("query", nn.initializers.normal(stddev=1.0),
                           (1, nq, hidden), self.param_dtype)
        # Blip2QFormerModel layernorms + dropouts the query embeds before the
        # layers (its embeddings stage) — required for checkpoint parity.
        q_states = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="ln_embed")(query.astype(self.dtype))
        q_states = jnp.broadcast_to(q_states, (b * nblocks, nq, hidden))
        q_states = nn.Dropout(0.1, deterministic=not train)(q_states)
        for i in range(cfg.qformer_num_layers):
            q_states = QFormerBlock(
                hidden, cfg.qformer_num_heads, intermediate,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(q_states, x, train=train)

        q_states = q_states.reshape(b, nblocks * nq, hidden)
        out = nn.Dense(cfg.llm_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="linear")(q_states)
        return out, jnp.float32(0.0)


PROJECTOR_CLASSES = {
    "mlp": MLPProjector,
    "mosa": MOSAProjector,
    "moe": MoEProjector,
    "qformer": QFormerProjector,
}


def create_projector(cfg: ASRConfig, dtype=jnp.bfloat16, param_dtype=jnp.float32):
    cls = PROJECTOR_CLASSES.get(cfg.projector_type)
    if cls is None:
        raise ValueError(
            f"Unknown projector_type: {cfg.projector_type}. "
            f"Valid options: {list(PROJECTOR_CLASSES)}"
        )
    return cls(cfg, dtype=dtype, param_dtype=param_dtype)
