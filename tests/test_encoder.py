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
