"""Whisper/GLM-ASR-style audio encoder in flax.linen, TPU-first.

Re-designed equivalent of the reference's frozen audio tower
(``/root/reference/tiny_audio/asr_modeling.py:203-237`` loads WhisperModel.encoder
or GLM-ASR's ``audio_tower``): a conv subsampling stack built from
``EncoderConfig.conv_layers`` (default k3/s1 + k3/s2, the
``DEFAULT_ENCODER_CONV_LAYERS`` contract), sinusoidal positions, and a pre-LN
transformer with biased QV projections (Whisper weight layout: k_proj has no
bias) and a final LayerNorm.

TPU design: ``nn.scan`` over layers, variable-length audio handled with a
static padded length + frame padding mask (XLA static shapes), bf16 compute
with fp32 LayerNorm statistics.

Weight conversion from HF WhisperEncoder checkpoints: :func:`convert_hf_whisper_encoder`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.config import EncoderConfig, compute_encoder_output_length
from tiny_audio_tpu.models.layers import sinusoidal_positions


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        x = x.astype(jnp.float32)
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (x * w + b).astype(dtype)


def _gelu(x: jax.Array, cfg: EncoderConfig, dtype) -> jax.Array:
    """GELU with a dtype-aware approximation policy.

    ``cfg.activation``: "gelu" (auto) uses the exact erf form in fp32 — the
    torch-oracle parity mode (reference towers use torch's exact GELU) — and
    the tanh form in bf16, where the two are numerically indistinguishable
    (max |Δ| ≈ 5e-4 on N(0,1) inputs, below bf16 rounding of O(1)
    activations) but erf costs 12.9 vs 5.7 ms/layer of VPU time at the
    B32 serving shape (measured; docs/performance.md).  "gelu_exact" /
    "gelu_tanh" force one form.
    """
    if cfg.activation == "gelu_exact":
        approx = False
    elif cfg.activation == "gelu_tanh":
        approx = True
    else:
        approx = dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approx)


class EncoderBlock(nn.Module):
    cfg: EncoderConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    calibrate: bool = False

    @nn.compact
    def __call__(self, x, padding_mask):
        from tiny_audio_tpu.ops.attention import encoder_self_attention

        cfg = self.cfg
        b, t, _ = x.shape
        h, hd = cfg.num_heads, cfg.head_dim

        def dense(feats, name, bias=True):
            return nn.Dense(
                feats, use_bias=bias, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )

        residual = x
        x = LayerNorm(cfg.layer_norm_eps, name="self_attn_layer_norm")(x)
        q = dense(h * hd, "q_proj")(x).reshape(b, t, h, hd)
        k = dense(h * hd, "k_proj", bias=False)(x).reshape(b, t, h, hd)
        v = dense(h * hd, "v_proj")(x).reshape(b, t, h, hd)
        if self.calibrate:
            # Calibration pass for the constant-shift-softmax window of the
            # TPU attention kernel (ops/encoder_attention.py): the kernel is
            # exact only while every row's max score lies inside
            # [SOFTMAX_SHIFT - 87, SOFTMAX_CLAMP].  Sow the observed row-max
            # extremes (valid rows only) so debug.calibrate_attention_window
            # can assert an imported checkpoint fits the window.  Matches the
            # kernel's numerics: bf16 q/k, fp32 accumulate, 1/sqrt(d) scale.
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (hd ** -0.5)
            if padding_mask is not None:
                col_ok = padding_mask.astype(bool)[:, None, None, :]
                s = jnp.where(col_ok, s, -jnp.inf)
            row_max = jnp.max(s, axis=-1)  # [B, H, T]
            if padding_mask is not None:
                row_ok = padding_mask.astype(bool)[:, None, :]
                hi = jnp.max(jnp.where(row_ok, row_max, -jnp.inf))
                lo = jnp.min(jnp.where(row_ok, row_max, jnp.inf))
            else:
                hi = jnp.max(row_max)
                lo = jnp.min(row_max)
            self.sow("intermediates", "attn_row_max_range",
                     jnp.stack([lo, hi]))
        out = encoder_self_attention(q, k, v, padding_mask)
        x = dense(cfg.d_model, "out_proj")(out.reshape(b, t, -1))
        x = residual + x

        residual = x
        x = LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")(x)
        x = dense(cfg.ffn_dim, "fc1")(x)
        x = _gelu(x, cfg, self.dtype)
        x = dense(cfg.d_model, "fc2")(x)
        return residual + x, None


class AudioEncoder(nn.Module):
    cfg: EncoderConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    # Sow per-layer attention row-max score extremes (see EncoderBlock) —
    # apply with mutable=["intermediates"]; used by
    # debug.calibrate_attention_window to validate the Pallas kernel's
    # constant-shift softmax window on imported checkpoints.
    calibrate: bool = False

    @nn.compact
    def __call__(
        self,
        input_features: jax.Array,
        frame_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Encode mel features.

        Args:
            input_features: [B, num_mel_bins, T_mel] log-mel features.
            frame_mask: optional [B, T_mel] mask of real mel frames.

        Returns:
            [B, T_enc, d_model] hidden states (T_enc via the conv formula).
        """
        cfg = self.cfg
        x = input_features.astype(self.dtype).transpose(0, 2, 1)  # [B, T, mel]

        for i, (pad, kernel, stride) in enumerate(cfg.conv_layers):
            x = nn.Conv(
                cfg.d_model,
                kernel_size=(kernel,),
                strides=(stride,),
                padding=[(pad, pad)],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i + 1}",
            )(x)
            x = _gelu(x, cfg, self.dtype)

        t_enc = x.shape[1]
        pos_table = self.param(
            "embed_positions",
            lambda key, shape: sinusoidal_positions(*shape),
            (cfg.max_source_positions, cfg.d_model),
        )
        x = x + jax.lax.dynamic_slice_in_dim(pos_table, 0, t_enc, axis=0).astype(
            self.dtype
        )[None]

        padding_mask = None
        if frame_mask is not None:
            enc_lengths = compute_encoder_output_length(
                frame_mask.sum(axis=-1), cfg.conv_layers
            )
            padding_mask = (
                jnp.arange(t_enc)[None, :] < enc_lengths[:, None]
            ).astype(jnp.int32)

        variable_axes = {"params": 0}
        if self.calibrate:
            variable_axes["intermediates"] = 0  # stack sown ranges per layer
        block = nn.scan(
            EncoderBlock,
            variable_axes=variable_axes,
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=cfg.num_layers,
        )
        x, _ = block(
            cfg, self.dtype, self.param_dtype, calibrate=self.calibrate,
            name="layers",
        )(x, padding_mask)
        return LayerNorm(cfg.layer_norm_eps, name="layer_norm")(x)


# ---------------------------------------------------------------------------
# HF weight conversion: three checkpoint flavors, one param layout
#
# Mirrors the reference's three-branch encoder loader
# (``/root/reference/tiny_audio/asr_modeling.py:203-237``):
#   whisper  -> WhisperModel.encoder           (keys ``[model.][encoder.]...``)
#   glm      -> GlmAsr full model .audio_tower (keys ``audio_tower....``, the
#               LM/projector keys of the full checkpoint are dropped — the
#               analogue of the reference freeing ``language_model``)
#   generic  -> AutoModel                      (whisper-layout assumed; alias
#               table below absorbs common renamings)
# ---------------------------------------------------------------------------

# Substring aliases normalizing GLM/Qwen2Audio-style tower naming onto the
# Whisper layout this converter targets.  Applied after prefix stripping.
_ENCODER_KEY_ALIASES = [
    (".self_attn.o_proj.", ".self_attn.out_proj."),
    (".input_layernorm.", ".self_attn_layer_norm."),
    (".post_attention_layernorm.", ".final_layer_norm."),
    (".mlp.fc1.", ".fc1."),
    (".mlp.fc2.", ".fc2."),
    ("ln_post.", "layer_norm."),  # openai-whisper export naming
]


def detect_encoder_flavor(state_dict: dict) -> str:
    """'glm' | 'whisper' | 'generic' from state-dict key shape."""
    keys = list(state_dict)
    if any(k.startswith(("audio_tower.", "model.audio_tower.")) for k in keys):
        return "glm"
    if any(".self_attn." in k or k.startswith(("encoder.", "model.encoder.", "conv1."))
           for k in keys):
        return "whisper"
    return "generic"


def normalize_encoder_state_dict(state_dict: dict) -> dict:
    """Strip wrapper prefixes + rename aliased keys to the Whisper layout.

    For GLM-style full-model checkpoints, keeps only the ``audio_tower.*``
    subtree (drops ``language_model.*`` / ``multi_modal_projector.*``).
    """
    flavor = detect_encoder_flavor(state_dict)
    out = {}
    for key, w in state_dict.items():
        key = key.removeprefix("model.")
        if flavor == "glm":
            if not key.startswith("audio_tower."):
                continue  # LM / projector keys of the full checkpoint
            key = key.removeprefix("audio_tower.")
            key = key.removeprefix("model.")  # nested wrapper, if any
        key = key.removeprefix("encoder.")
        for old, new in _ENCODER_KEY_ALIASES:
            if old in key:
                key = key.replace(old, new)
        # conv stacks exported as a list module: conv_layers.{i}./convs.{i}.
        for stem in ("conv_layers.", "convs.", "conv."):
            if key.startswith(stem):
                i, rest = key[len(stem):].split(".", 1)
                key = f"conv{int(i) + 1}.{rest}"
                break
        out[key] = w
    return out


def convert_hf_audio_encoder(state_dict: dict, cfg: EncoderConfig, dtype=jnp.bfloat16) -> dict:
    """Three-branch encoder conversion (whisper / GLM audio_tower / generic).

    Passes the RAW dict through: convert_hf_whisper_encoder normalizes
    exactly once (normalizing here too would run the alias rewrite twice,
    which only works while every alias happens to be idempotent).
    """
    return convert_hf_whisper_encoder(state_dict, cfg, dtype=dtype)


def convert_hf_whisper_encoder(state_dict: dict, cfg: EncoderConfig, dtype=jnp.bfloat16) -> dict:
    """Convert an HF WhisperEncoder state_dict to this module's params.

    Accepts keys with or without an ``encoder.`` prefix (WhisperModel vs bare
    encoder exports); GLM ``audio_tower.*`` checkpoints are normalized first
    (see :func:`normalize_encoder_state_dict` /
    :func:`convert_hf_audio_encoder`).
    """

    sd = {}
    for key, w in normalize_encoder_state_dict(state_dict).items():
        sd[key] = np.asarray(
            w.detach().cpu().float().numpy() if hasattr(w, "detach") else w
        )

    if "conv1.weight" not in sd or not any(k.startswith("layers.0.") for k in sd):
        raise KeyError(
            "unrecognized encoder state-dict layout after normalization; "
            f"sample keys: {sorted(sd)[:12]}"
        )

    def t(name, cast=None, conv=False, transpose=False):
        w = sd[name]
        if conv:  # torch Conv1d [out, in, k] -> flax [k, in, out]
            w = w.transpose(2, 1, 0)
        elif transpose:
            w = w.T
        return jnp.asarray(w, dtype=cast or dtype)

    def stack(fmt, **kw):
        return jnp.stack([t(fmt.format(i), **kw) for i in range(cfg.num_layers)])

    layers = {}
    for flax_name, hf_name, bias in [
        ("q_proj", "self_attn.q_proj", True),
        ("k_proj", "self_attn.k_proj", False),
        ("v_proj", "self_attn.v_proj", True),
        ("out_proj", "self_attn.out_proj", True),
        ("fc1", "fc1", True),
        ("fc2", "fc2", True),
    ]:
        entry = {"kernel": stack("layers.{}." + hf_name + ".weight", transpose=True)}
        if bias:
            entry["bias"] = stack("layers.{}." + hf_name + ".bias")
        layers[flax_name] = entry
    for flax_name, hf_name in [
        ("self_attn_layer_norm", "self_attn_layer_norm"),
        ("final_layer_norm", "final_layer_norm"),
    ]:
        layers[flax_name] = {
            "weight": stack("layers.{}." + hf_name + ".weight", cast=jnp.float32),
            "bias": stack("layers.{}." + hf_name + ".bias", cast=jnp.float32),
        }

    params = {"layers": layers}
    for i in range(len(cfg.conv_layers)):
        params[f"conv{i + 1}"] = {
            "kernel": t(f"conv{i + 1}.weight", conv=True),
            "bias": t(f"conv{i + 1}.bias"),
        }
    params["embed_positions"] = t("embed_positions.weight", cast=jnp.float32)
    params["layer_norm"] = {
        "weight": t("layer_norm.weight", cast=jnp.float32),
        "bias": t("layer_norm.bias", cast=jnp.float32),
    }
    return params
