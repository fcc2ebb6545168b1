"""Wav2Vec2-CTC acoustic model for forced alignment, in flax.linen.

Re-designed equivalent of the reference's torchaudio
``WAV2VEC2_ASR_BASE_960H`` bundle (``/root/reference/tiny_audio/alignment.py:27-45``):
7-layer conv feature extractor (total stride 320 -> 20 ms frames), feature
projection, 12-layer transformer with convolutional relative positions, and a
character CTC head (29 labels, blank at 0).

Weight conversion from an HF ``Wav2Vec2ForCTC`` checkpoint:
:func:`convert_hf_wav2vec2`.  Without pretrained weights the aligner falls
back to uniform spans (same fallback the reference uses on trellis failure).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.models.layers import attention

# torchaudio WAV2VEC2_ASR_BASE_960H label set (blank '-' first)
CTC_LABELS = (
    "-", "|", "E", "T", "A", "O", "N", "I", "H", "S", "R", "D", "L", "U",
    "M", "W", "C", "F", "G", "Y", "P", "B", "V", "K", "'", "X", "J", "Q", "Z",
)

# (out_channels, kernel, stride) per conv layer; total stride 320
CONV_LAYERS = [
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 3, 2), (512, 2, 2), (512, 2, 2),
]
D_MODEL = 768
NUM_LAYERS = 12
NUM_HEADS = 12
FFN_DIM = 3072


def conv_frame_count(n_samples: int):
    """Real output frames for ``n_samples`` of audio through the VALID-conv
    feature extractor (works on host ints and traced scalars)."""
    n = n_samples
    for _, k, s in CONV_LAYERS:
        n = (n - k) // s + 1
    return n


class _MaskedChannelNorm(nn.Module):
    """GroupNorm with ``num_groups == channels`` (per-channel stats over
    time) computed over REAL frames only — identical to ``nn.GroupNorm``
    on unpadded input (same param tree: scale/bias [C]), exact under
    right-padding where the stock op would fold pad frames into the
    statistics."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, frame_valid: jax.Array) -> jax.Array:
        # x: [B, T, C]; frame_valid: [T] bool
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        m = frame_valid[None, :, None]
        denom = jnp.maximum(jnp.sum(frame_valid), 1).astype(x.dtype)
        mean = jnp.sum(jnp.where(m, x, 0), axis=1, keepdims=True) / denom
        var = jnp.sum(
            jnp.where(m, (x - mean) ** 2, 0), axis=1, keepdims=True
        ) / denom
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class Wav2Vec2CTC(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, waveform: jax.Array,
                 n_samples: Optional[jax.Array] = None) -> jax.Array:
        """[B, S] float32 16 kHz audio -> [B, T, 29] log-probs (20 ms frames).

        ``n_samples`` (traced scalar): real sample count when ``waveform``
        is right-padded to a static length bucket (the aligner pads so one
        graph serves a duration range instead of compiling per clip
        length).  Real-frame emissions are exact vs the unpadded call: the
        convs are VALID (real frames' windows never touch padding), the
        group norm masks pad frames out of its statistics, pad rows are
        zeroed before the positional conv (reproducing its zero padding),
        and self-attention masks pad keys.  Rows past
        ``conv_frame_count(n_samples)`` are garbage — slice them off.
        """
        x = waveform[:, :, None].astype(self.dtype)  # [B, S, 1]
        n_real = (jnp.asarray(waveform.shape[1], jnp.int32)
                  if n_samples is None
                  else jnp.asarray(n_samples, jnp.int32))
        for i, (ch, k, s) in enumerate(CONV_LAYERS):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            n_real = (n_real - k) // s + 1
            if i == 0:
                x = _MaskedChannelNorm(name="conv_gn")(
                    x, jnp.arange(x.shape[1]) < n_real
                )
            x = nn.gelu(x, approximate=False)

        frame_valid = jnp.arange(x.shape[1]) < n_real  # [T] real frames
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="fp_ln")(x)
        x = nn.Dense(D_MODEL, dtype=self.dtype, name="fp_proj")(x)
        # zero pad rows: the positional conv's window must see the same
        # zeros past the clip end as its own padding provides unpadded
        x = jnp.where(frame_valid[None, :, None], x, 0)

        # Convolutional positional embedding (kernel 128, 16 groups)
        pos = nn.Conv(
            D_MODEL, (128,), strides=(1,), padding=[(64, 64)],
            feature_group_count=16, dtype=self.dtype, name="pos_conv",
        )(x)
        pos = nn.gelu(pos[:, : x.shape[1]], approximate=False)
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_ln")(x)

        b, t, _ = x.shape
        key_mask = jnp.broadcast_to(frame_valid[None, :], (b, t))
        hd = D_MODEL // NUM_HEADS
        for i in range(NUM_LAYERS):
            name = f"layer_{i}"
            residual = x
            q = nn.Dense(D_MODEL, dtype=self.dtype, name=f"{name}_q")(x)
            k = nn.Dense(D_MODEL, dtype=self.dtype, name=f"{name}_k")(x)
            v = nn.Dense(D_MODEL, dtype=self.dtype, name=f"{name}_v")(x)
            out = attention(
                q.reshape(b, t, NUM_HEADS, hd),
                k.reshape(b, t, NUM_HEADS, hd),
                v.reshape(b, t, NUM_HEADS, hd),
                mask=key_mask,
            ).reshape(b, t, D_MODEL)
            x = residual + nn.Dense(D_MODEL, dtype=self.dtype, name=f"{name}_o")(out)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_ln1")(x)
            residual = x
            h = nn.Dense(FFN_DIM, dtype=self.dtype, name=f"{name}_fc1")(x)
            h = nn.gelu(h, approximate=False)
            x = residual + nn.Dense(D_MODEL, dtype=self.dtype, name=f"{name}_fc2")(h)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_ln2")(x)

        logits = nn.Dense(len(CTC_LABELS), dtype=self.dtype, name="ctc_head")(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def convert_hf_wav2vec2(state_dict: dict, dtype=jnp.float32) -> dict:
    """Convert an HF ``Wav2Vec2ForCTC`` state_dict to this module's params."""

    sd = {}
    for key, w in state_dict.items():
        sd[key.removeprefix("wav2vec2.")] = np.asarray(
            w.detach().cpu().float().numpy() if hasattr(w, "detach") else w
        )

    def t(name, conv=False, transpose=False):
        w = sd[name]
        if conv:
            w = w.transpose(2, 1, 0)  # [out, in, k] -> [k, in, out]
        elif transpose:
            w = w.T
        return jnp.asarray(w, dtype)

    p: dict = {}
    for i in range(len(CONV_LAYERS)):
        p[f"conv_{i}"] = {
            "kernel": t(f"feature_extractor.conv_layers.{i}.conv.weight", conv=True)
        }
    p["conv_gn"] = {
        "scale": t("feature_extractor.conv_layers.0.layer_norm.weight"),
        "bias": t("feature_extractor.conv_layers.0.layer_norm.bias"),
    }
    p["fp_ln"] = {
        "scale": t("feature_projection.layer_norm.weight"),
        "bias": t("feature_projection.layer_norm.bias"),
    }
    p["fp_proj"] = {
        "kernel": t("feature_projection.projection.weight", transpose=True),
        "bias": t("feature_projection.projection.bias"),
    }
    # HF stores pos_conv fused, weight-norm split (weight_g/weight_v), or as
    # torch parametrizations (original0/original1), depending on version
    base_pc = "encoder.pos_conv_embed.conv"
    if f"{base_pc}.weight" in sd:
        pc = sd[f"{base_pc}.weight"]
    else:
        if f"{base_pc}.weight_g" in sd:
            g = sd[f"{base_pc}.weight_g"]
            v = sd[f"{base_pc}.weight_v"]
        else:
            g = sd[f"{base_pc}.parametrizations.weight.original0"]
            v = sd[f"{base_pc}.parametrizations.weight.original1"]
        norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
        pc = g * v / np.maximum(norm, 1e-12)
    # torch conv [out, in/groups, k] -> flax [k, in/groups, out]
    p["pos_conv"] = {
        "kernel": jnp.asarray(pc.transpose(2, 1, 0), dtype),
        "bias": t("encoder.pos_conv_embed.conv.bias"),
    }
    p["enc_ln"] = {
        "scale": t("encoder.layer_norm.weight"),
        "bias": t("encoder.layer_norm.bias"),
    }
    for i in range(NUM_LAYERS):
        base = f"encoder.layers.{i}"
        for ours, theirs in [
            (f"layer_{i}_q", "attention.q_proj"),
            (f"layer_{i}_k", "attention.k_proj"),
            (f"layer_{i}_v", "attention.v_proj"),
            (f"layer_{i}_o", "attention.out_proj"),
            (f"layer_{i}_fc1", "feed_forward.intermediate_dense"),
            (f"layer_{i}_fc2", "feed_forward.output_dense"),
        ]:
            p[ours] = {
                "kernel": t(f"{base}.{theirs}.weight", transpose=True),
                "bias": t(f"{base}.{theirs}.bias"),
            }
        p[f"layer_{i}_ln1"] = {
            "scale": t(f"{base}.layer_norm.weight"),
            "bias": t(f"{base}.layer_norm.bias"),
        }
        p[f"layer_{i}_ln2"] = {
            "scale": t(f"{base}.final_layer_norm.weight"),
            "bias": t(f"{base}.final_layer_norm.bias"),
        }
    p["ctc_head"] = {
        "kernel": _remap_ctc_head(t("lm_head.weight", transpose=True), axis=1),
        "bias": _remap_ctc_head(t("lm_head.bias"), axis=0),
    }
    return p


# Real HF facebook/wav2vec2-base-960h vocab.json ordering (32 tokens) —
# letters sit at +3 vs torchaudio's 29-label set because of <s>/</s>/<unk>.
_HF_960H_VOCAB = (
    "<pad>", "<s>", "</s>", "<unk>", "|", "E", "T", "A", "O", "N", "I",
    "H", "S", "R", "D", "L", "U", "M", "W", "C", "F", "G", "Y", "P", "B",
    "V", "K", "'", "X", "J", "Q", "Z",
)


def _remap_ctc_head(w, axis: int):
    """Permute a real HF 32-token CTC head into CTC_LABELS order.

    ``ForcedAligner`` indexes logits by the 29-symbol torchaudio ordering
    (blank '-', then '|', then letters).  Copying a genuine 960h checkpoint
    head verbatim offset every letter by 3 (<s>/</s>/<unk> slots), so the
    trellis read <s>/</s> logits for every character and alignments were
    garbage.  29-wide heads (the torchaudio layout, and the tiny random
    oracles in tests) pass through unchanged.
    """
    if w.shape[axis] == len(CTC_LABELS):
        return w
    if w.shape[axis] != len(_HF_960H_VOCAB):
        raise ValueError(
            f"unexpected CTC head vocab size {w.shape[axis]}; expected "
            f"{len(CTC_LABELS)} (torchaudio) or {len(_HF_960H_VOCAB)} (HF 960h)"
        )
    hf_index = {tok: i for i, tok in enumerate(_HF_960H_VOCAB)}
    perm = [hf_index["<pad>" if lab == "-" else lab] for lab in CTC_LABELS]
    return jnp.take(w, jnp.asarray(perm), axis=axis)
