"""ECAPA-TDNN speaker encoder (speechbrain-exact) + weight converter.

The reference loads speechbrain ``spkrec-ecapa-voxceleb``
(``/root/reference/tiny_audio/diarization.py:470-479``) for diarization
embeddings.  This is a flax reimplementation of speechbrain's ``ECAPA_TDNN``
at inference semantics — reflect-padded "same" convs, eval-mode BatchNorm
(running statistics stored as params), Res2Net chunk chaining, SE blocks,
multi-layer feature aggregation, and global-context attentive statistics
pooling — so a converted speechbrain checkpoint reproduces the torch forward
numerically (see ``tests/test_ecapa.py``'s torch oracle).

Layout convention: [B, T, C] (speechbrain's public convention; its conv ops
transpose internally, ours are natively time-major for TPU).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BatchNorm1dEval(nn.Module):
    """Eval-mode BatchNorm: running statistics are plain params (the speaker
    tower is never trained here, matching the reference's frozen usage)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def _reflect_same(x, kernel: int, dilation: int):
    """speechbrain Conv1d pads 'same' with reflect mode (odd kernels)."""
    pad = (kernel - 1) * dilation // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    return x


class TDNNBlock(nn.Module):
    """Conv1d('same', reflect) -> ReLU -> BatchNorm (speechbrain TDNNBlock)."""

    out: int
    kernel: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        x = _reflect_same(x, self.kernel, self.dilation)
        x = nn.Conv(self.out, (self.kernel,), kernel_dilation=(self.dilation,),
                    padding="VALID", name="conv")(x)
        return BatchNorm1dEval(name="norm")(nn.relu(x))


class Res2NetBlock(nn.Module):
    """Chunk the channels into ``scale`` groups; chain TDNNs with additive
    feed-forward of the previous group's output (speechbrain Res2NetBlock)."""

    out: int
    scale: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        width = x.shape[-1] // self.scale
        hidden = self.out // self.scale
        chunks = [x[..., i * width:(i + 1) * width] for i in range(self.scale)]
        outs = [chunks[0]]
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + outs[-1]
            outs.append(
                TDNNBlock(hidden, self.kernel, self.dilation,
                          name=f"block_{i - 1}")(inp)
            )
        return jnp.concatenate(outs, axis=-1)


class SERes2NetBlock(nn.Module):
    """tdnn1 -> Res2Net -> tdnn2 -> SE, residual add (speechbrain)."""

    out: int
    scale: int = 8
    se_channels: int = 128
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x  # in == out for the voxceleb model (no shortcut conv)
        h = TDNNBlock(self.out, 1, 1, name="tdnn1")(x)
        h = Res2NetBlock(self.out, self.scale, self.kernel, self.dilation,
                         name="res2net_block")(h)
        h = TDNNBlock(self.out, 1, 1, name="tdnn2")(h)
        s = h.mean(axis=1, keepdims=True)
        s = nn.relu(nn.Conv(self.se_channels, (1,), name="se_conv1")(s))
        s = nn.sigmoid(nn.Conv(self.out, (1,), name="se_conv2")(s))
        return h * s + residual


class EcapaTDNN(nn.Module):
    """speechbrain ECAPA_TDNN: [B, T, n_mels] -> [B, embed_dim].

    ``channels`` follows speechbrain's list convention; the voxceleb
    checkpoint uses (1024, 1024, 1024, 1024, 3072).
    """

    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    embed_dim: int = 192
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        h = TDNNBlock(ch[0], self.kernel_sizes[0], self.dilations[0],
                      name="blocks_0")(x)
        feats = []
        for i in range(1, 4):
            h = SERes2NetBlock(
                ch[i], self.res2net_scale, self.se_channels,
                self.kernel_sizes[i], self.dilations[i], name=f"blocks_{i}",
            )(h)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        h = TDNNBlock(ch[-1], self.kernel_sizes[-1], self.dilations[-1],
                      name="mfa")(h)

        # Attentive statistics pooling with global context (speechbrain ASP).
        eps = 1e-12
        t = h.shape[1]
        mean_g = h.mean(axis=1, keepdims=True)
        std_g = jnp.sqrt(
            jnp.clip(((h - mean_g) ** 2).mean(axis=1, keepdims=True), eps)
        )
        attn_in = jnp.concatenate(
            [h, jnp.broadcast_to(mean_g, h.shape),
             jnp.broadcast_to(std_g, h.shape)], axis=-1
        )
        a = TDNNBlock(self.attention_channels, 1, 1, name="asp_tdnn")(attn_in)
        a = nn.Conv(ch[-1], (1,), name="asp_conv")(jnp.tanh(a))
        w = jax.nn.softmax(a, axis=1)
        mu = (w * h).sum(axis=1)
        sd = jnp.sqrt(jnp.clip((w * (h - mu[:, None]) ** 2).sum(axis=1), eps))
        pooled = jnp.concatenate([mu, sd], axis=-1)

        pooled = BatchNorm1dEval(name="asp_bn")(pooled)
        return nn.Dense(self.embed_dim, name="fc")(pooled)


# ---------------------------------------------------------------------------
# speechbrain checkpoint conversion
# ---------------------------------------------------------------------------


def _np(w) -> np.ndarray:
    return np.asarray(
        w.detach().cpu().float().numpy() if hasattr(w, "detach") else w
    )


def convert_speechbrain_ecapa(state_dict: dict) -> tuple[dict, "EcapaTDNN"]:
    """speechbrain ``embedding_model.ckpt`` state dict -> (params, module).

    speechbrain naming: its Conv1d/BatchNorm1d wrappers nest the torch module
    under ``.conv`` / ``.norm``, TDNNBlock = {conv, norm}, e.g.
    ``blocks.0.conv.conv.weight``.  Dims (channels, embed, scale) are
    inferred from shapes so both the 512- and 1024-channel releases convert.
    """
    sd = {k.removeprefix("embedding_model."): _np(v)
          for k, v in state_dict.items()}

    def conv(name):  # torch [out, in, k] -> flax [k, in, out]
        p = {"kernel": jnp.asarray(sd[f"{name}.weight"].transpose(2, 1, 0))}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{name}.bias"])
        return p

    def bn(name):
        return {
            "scale": jnp.asarray(sd[f"{name}.weight"]),
            "bias": jnp.asarray(sd[f"{name}.bias"]),
            "mean": jnp.asarray(sd[f"{name}.running_mean"]),
            "var": jnp.asarray(sd[f"{name}.running_var"]),
        }

    def tdnn(name):
        return {"conv": conv(f"{name}.conv.conv"), "norm": bn(f"{name}.norm.norm")}

    params: dict[str, Any] = {"blocks_0": tdnn("blocks.0")}
    n_res2net = 0
    while f"blocks.1.res2net_block.blocks.{n_res2net}.conv.conv.weight" in sd:
        n_res2net += 1
    for i in (1, 2, 3):
        params[f"blocks_{i}"] = {
            "tdnn1": tdnn(f"blocks.{i}.tdnn1"),
            "tdnn2": tdnn(f"blocks.{i}.tdnn2"),
            "res2net_block": {
                f"block_{j}": tdnn(f"blocks.{i}.res2net_block.blocks.{j}")
                for j in range(n_res2net)
            },
            "se_conv1": conv(f"blocks.{i}.se_block.conv1.conv"),
            "se_conv2": conv(f"blocks.{i}.se_block.conv2.conv"),
        }
    params["mfa"] = tdnn("mfa")
    params["asp_tdnn"] = tdnn("asp.tdnn")
    params["asp_conv"] = conv("asp.conv.conv")
    params["asp_bn"] = bn("asp_bn.norm")
    fc_w = sd["fc.conv.weight"]  # [embed, 2*C, 1]
    fc = {"kernel": jnp.asarray(fc_w[:, :, 0].T)}
    if "fc.conv.bias" in sd:
        fc["bias"] = jnp.asarray(sd["fc.conv.bias"])
    params["fc"] = fc

    c0 = sd["blocks.0.conv.conv.weight"].shape[0]
    c_last = sd["mfa.conv.conv.weight"].shape[0]
    module = EcapaTDNN(
        channels=(c0, c0, c0, c0, c_last),
        embed_dim=fc_w.shape[0],
        attention_channels=sd["asp.tdnn.conv.conv.weight"].shape[0],
        res2net_scale=(n_res2net + 1),
        se_channels=sd["blocks.1.se_block.conv1.conv.weight"].shape[0],
    )
    return params, module
