"""ECAPA-TDNN conversion parity vs a torch oracle.

speechbrain is not installed in this environment, so the oracle is a torch
reimplementation of speechbrain's ``ECAPA_TDNN`` (lobes/models/ECAPA_TDNN.py)
with the exact module names its checkpoints use (``blocks.0.conv.conv.weight``
etc).  ``convert_speechbrain_ecapa`` must map that state dict onto our flax
module and reproduce the forward numerically.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402


class SBConv1d(nn.Module):
    """speechbrain Conv1d: 'same' padding in reflect mode, torch conv under
    ``.conv`` (operates channel-first internally)."""

    def __init__(self, in_c, out_c, k, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(in_c, out_c, k, dilation=dilation)
        self.k, self.d = k, dilation

    def forward(self, x):  # [B, C, T]
        pad = (self.k - 1) * self.d // 2
        if pad:
            x = F.pad(x, (pad, pad), mode="reflect")
        return self.conv(x)


class SBBatchNorm1d(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.BatchNorm1d(c)

    def forward(self, x):
        return self.norm(x)


class SBTDNNBlock(nn.Module):
    def __init__(self, in_c, out_c, k, dilation):
        super().__init__()
        self.conv = SBConv1d(in_c, out_c, k, dilation)
        self.activation = nn.ReLU()
        self.norm = SBBatchNorm1d(out_c)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class SBRes2NetBlock(nn.Module):
    def __init__(self, in_c, out_c, scale, k, dilation):
        super().__init__()
        in_ch, hid = in_c // scale, out_c // scale
        self.blocks = nn.ModuleList(
            [SBTDNNBlock(in_ch, hid, k, dilation) for _ in range(scale - 1)]
        )
        self.scale = scale

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SBSEBlock(nn.Module):
    def __init__(self, in_c, se_c, out_c):
        super().__init__()
        self.conv1 = SBConv1d(in_c, se_c, 1)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = SBConv1d(se_c, out_c, 1)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = self.relu(self.conv1(s))
        s = self.sigmoid(self.conv2(s))
        return s * x


class SBSERes2NetBlock(nn.Module):
    def __init__(self, in_c, out_c, scale, se_c, k, dilation):
        super().__init__()
        self.tdnn1 = SBTDNNBlock(in_c, out_c, 1, 1)
        self.res2net_block = SBRes2NetBlock(out_c, out_c, scale, k, dilation)
        self.tdnn2 = SBTDNNBlock(out_c, out_c, 1, 1)
        self.se_block = SBSEBlock(out_c, se_c, out_c)

    def forward(self, x):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x)
        return x + residual


class SBASP(nn.Module):
    """Attentive statistics pooling with global context (speechbrain)."""

    def __init__(self, channels, attention_channels):
        super().__init__()
        self.tdnn = SBTDNNBlock(channels * 3, attention_channels, 1, 1)
        self.tanh = nn.Tanh()
        self.conv = SBConv1d(attention_channels, channels, 1)
        self.eps = 1e-12

    @staticmethod
    def _stats(x, m, eps):
        mean = (m * x).sum(dim=2)
        std = torch.sqrt(
            (m * (x - mean.unsqueeze(2)).pow(2)).sum(dim=2).clamp(eps)
        )
        return mean, std

    def forward(self, x):  # [B, C, T]
        L = x.shape[-1]
        mean, std = self._stats(x, 1.0 / L, self.eps)
        attn = torch.cat(
            [x, mean.unsqueeze(2).repeat(1, 1, L),
             std.unsqueeze(2).repeat(1, 1, L)], dim=1
        )
        attn = self.conv(self.tanh(self.tdnn(attn)))
        attn = F.softmax(attn, dim=2)
        mean, std = self._stats(x, attn, self.eps)
        return torch.cat((mean, std), dim=1).unsqueeze(2)


class SBEcapa(nn.Module):
    """speechbrain ECAPA_TDNN with checkpoint-exact attribute names."""

    def __init__(self, n_mels=80, channels=(64, 64, 64, 64, 192),
                 embed_dim=24, scale=4, se_c=16, attn_c=32):
        super().__init__()
        ks, ds = (5, 3, 3, 3, 1), (1, 2, 3, 4, 1)
        self.blocks = nn.ModuleList([SBTDNNBlock(n_mels, channels[0], ks[0], ds[0])])
        for i in range(1, 4):
            self.blocks.append(
                SBSERes2NetBlock(channels[i - 1], channels[i], scale, se_c,
                                 ks[i], ds[i])
            )
        self.mfa = SBTDNNBlock(channels[2] * 3, channels[-1], ks[-1], ds[-1])
        self.asp = SBASP(channels[-1], attn_c)
        self.asp_bn = SBBatchNorm1d(channels[-1] * 2)
        self.fc = SBConv1d(channels[-1] * 2, embed_dim, 1)

    def forward(self, x):  # [B, T, n_mels] (speechbrain convention)
        x = x.transpose(1, 2)
        xl = []
        for layer in self.blocks:
            x = layer(x)
            xl.append(x)
        x = torch.cat(xl[1:], dim=1)
        x = self.mfa(x)
        x = self.asp(x)
        x = self.asp_bn(x)
        x = self.fc(x)
        return x.transpose(1, 2)  # [B, 1, embed]


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = SBEcapa().eval()
    # non-trivial BatchNorm running stats to prove they're converted
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)
    return model


class TestEcapaConversion:
    def test_forward_parity(self, oracle):
        from tiny_audio_tpu.models.ecapa import convert_speechbrain_ecapa

        params, module = convert_speechbrain_ecapa(oracle.state_dict())
        assert module.channels == (64, 64, 64, 64, 192)
        assert module.embed_dim == 24 and module.res2net_scale == 4

        rng = np.random.default_rng(0)
        feats = rng.standard_normal((2, 120, 80)).astype(np.float32)
        with torch.no_grad():
            expected = oracle(torch.from_numpy(feats)).squeeze(1).numpy()
        got = np.asarray(module.apply({"params": params}, jnp.asarray(feats)))
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)

    def test_embedding_model_prefix_stripped(self, oracle):
        """Full speechbrain checkpoints prefix with ``embedding_model.``."""
        from tiny_audio_tpu.models.ecapa import convert_speechbrain_ecapa

        sd = {f"embedding_model.{k}": v for k, v in oracle.state_dict().items()}
        params, module = convert_speechbrain_ecapa(sd)
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((1, 90, 80)).astype(np.float32)
        with torch.no_grad():
            expected = oracle(torch.from_numpy(feats)).squeeze(1).numpy()
        got = np.asarray(module.apply({"params": params}, jnp.asarray(feats)))
        np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-3)
