"""Encoder parity vs HF WhisperEncoder (random-init oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.config import EncoderConfig
from tiny_audio_tpu.models.encoder import AudioEncoder, convert_hf_whisper_encoder

CFG = EncoderConfig(
    num_mel_bins=80,
    d_model=64,
    num_layers=2,
    num_heads=4,
    ffn_dim=128,
    max_source_positions=128,
)


@pytest.fixture(scope="module")
def hf_encoder():
    import torch
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    config = WhisperConfig(
        num_mel_bins=CFG.num_mel_bins,
        d_model=CFG.d_model,
        encoder_layers=CFG.num_layers,
        encoder_attention_heads=CFG.num_heads,
        encoder_ffn_dim=CFG.ffn_dim,
        max_source_positions=CFG.max_source_positions,
        decoder_layers=1,
        decoder_attention_heads=4,
        decoder_ffn_dim=64,
        attn_implementation="eager",
    )
    model = WhisperModel(config).encoder
    model.eval()
    return model


def test_encoder_matches_hf(hf_encoder, rng):
    import torch

    mel = rng.standard_normal((2, CFG.num_mel_bins, 2 * CFG.max_source_positions)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = hf_encoder(torch.tensor(mel)).last_hidden_state.numpy()

    enc = AudioEncoder(CFG, dtype=jnp.float32, param_dtype=jnp.float32)
    params = {"params": convert_hf_whisper_encoder(hf_encoder.state_dict(), CFG, jnp.float32)}
    out = enc.apply(params, jnp.asarray(mel))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=2e-3)


def test_encoder_variable_length_masking(hf_encoder, rng):
    """A padded batch with frame mask must reproduce the unpadded forward at
    real positions (the variable-length GLM path contract).  Self-consistency
    oracle: HF Whisper only accepts its fixed window, so the unpadded
    reference is our own encoder on the short input."""
    t_full, t_short = 2 * CFG.max_source_positions, CFG.max_source_positions
    mel_short = rng.standard_normal((1, CFG.num_mel_bins, t_short)).astype(np.float32)

    enc = AudioEncoder(CFG, dtype=jnp.float32, param_dtype=jnp.float32)
    params = {"params": convert_hf_whisper_encoder(hf_encoder.state_dict(), CFG, jnp.float32)}

    ref_short = np.asarray(enc.apply(params, jnp.asarray(mel_short)))

    mel_padded = np.zeros((1, CFG.num_mel_bins, t_full), dtype=np.float32)
    mel_padded[:, :, :t_short] = mel_short
    mask = np.zeros((1, t_full), dtype=np.int32)
    mask[:, :t_short] = 1
    out = enc.apply(params, jnp.asarray(mel_padded), frame_mask=jnp.asarray(mask))
    enc_len = ref_short.shape[1]
    np.testing.assert_allclose(
        np.asarray(out)[:, :enc_len], ref_short, atol=3e-4, rtol=2e-3
    )


class TestGeluPolicy:
    """The dtype-aware GELU rule: exact erf in fp32 (torch-oracle parity),
    tanh in bf16 (sub-ulp difference, 2.3x cheaper on the VPU)."""

    def test_fp32_uses_exact(self):
        import flax.linen as nn

        from tiny_audio_tpu.models.encoder import _gelu

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(4096).astype(np.float32) * 2
        )
        out = _gelu(x, CFG, jnp.float32)
        exact = nn.gelu(x, approximate=False)
        assert np.array_equal(np.asarray(out), np.asarray(exact))

    def test_bf16_tanh_within_bf16_rounding(self):
        import flax.linen as nn

        from tiny_audio_tpu.models.encoder import _gelu

        x32 = np.random.default_rng(1).standard_normal(8192).astype(np.float32) * 3
        x_bf = jnp.asarray(x32, jnp.bfloat16)
        out = _gelu(x_bf, CFG, jnp.bfloat16)
        # exact erf on the SAME bf16-quantized input, in fp32 — isolates the
        # tanh-vs-erf gap from input quantization
        exact = nn.gelu(x_bf.astype(jnp.float32), approximate=False)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(exact))
        # within a few bf16 ulps (the whole tanh chain runs in bf16), plus a
        # 4.5e-3 absolute floor: below x ~ -3 bf16-tanh saturates and the
        # output flushes to -0 while exact gelu is still ~-0.004 — noise-level
        # activations (gelu(-3) = -0.0040 is the largest flushable magnitude)
        bound = 0.03 * np.abs(np.asarray(exact)) + 4.5e-3
        assert (err <= bound).all(), float((err - bound).max())

    def test_forced_forms(self):
        import dataclasses

        import flax.linen as nn

        from tiny_audio_tpu.models.encoder import _gelu

        x = jnp.asarray(
            np.random.default_rng(2).standard_normal(512).astype(np.float32)
        )
        cfg_exact = dataclasses.replace(CFG, activation="gelu_exact")
        cfg_tanh = dataclasses.replace(CFG, activation="gelu_tanh")
        assert np.array_equal(
            np.asarray(_gelu(x, cfg_exact, jnp.bfloat16)),
            np.asarray(nn.gelu(x, approximate=False)),
        )
        assert np.array_equal(
            np.asarray(_gelu(x, cfg_tanh, jnp.float32)),
            np.asarray(nn.gelu(x, approximate=True)),
        )
