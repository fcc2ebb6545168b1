"""int8 KV cache: quantization bounds, decode agreement vs bf16 cache,
generation end-to-end, beam compatibility."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.generation import GenerationConfig, generate_beams, generate_tokens
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.models.decoder import Qwen3Decoder, quantize_kv


class TestQuantizeKV:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))
        q, scale = quantize_kv(x)
        assert q.dtype == jnp.int8 and scale.shape == (4, 8)
        recon = q.astype(jnp.float32) * scale[..., None]
        rel = float(jnp.abs(recon - x).max() / jnp.abs(x).max())
        assert rel < 0.01  # half an int8 step

    def test_zero_input_safe(self):
        q, scale = quantize_kv(jnp.zeros((2, 3, 4)))
        assert np.isfinite(np.asarray(scale)).all()
        assert (np.asarray(q) == 0).all()


@pytest.fixture(scope="module")
def models():
    cfg_bf16 = tiny_test_config(model_dtype="float32")
    cfg_int8 = tiny_test_config(model_dtype="float32", kv_cache_dtype="int8")
    m_bf16 = ASRModel(cfg_bf16, seed=0)
    m_int8 = ASRModel(cfg_int8, seed=0)
    m_int8.params = jax.tree_util.tree_map(lambda x: x, m_bf16.params)
    return m_bf16, m_int8


def _embeds(model, ids):
    return model.decoder.apply(
        {"params": model.params["decoder"]}, ids, method=Qwen3Decoder.embed
    )


class TestInt8Decode:
    def test_cache_structure(self, models):
        _, m = models
        cache = m.decoder.init_cache(2, 16, dtype=jnp.float32)
        assert cache["k"].dtype == jnp.int8
        assert cache["k_scale"].shape == (
            m.config.decoder.num_layers, 2, 16, m.config.decoder.num_kv_heads
        )

    def test_greedy_tokens_match_bf16(self, models):
        """On a tiny random model the int8 cache should reproduce the bf16
        greedy tokens for a short horizon (logit gaps >> quant noise)."""
        m_bf16, m_int8 = models
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 512, (2, 6)), jnp.int32)
        gen = GenerationConfig(max_new_tokens=6, eos_token_ids=(), pad_token_id=0)
        t_bf16, _ = generate_tokens(
            m_bf16.decoder, {"params": m_bf16.params["decoder"]},
            _embeds(m_bf16, ids), ids, gen,
        )
        t_int8, _ = generate_tokens(
            m_int8.decoder, {"params": m_int8.params["decoder"]},
            _embeds(m_int8, ids), ids, gen,
        )
        agreement = (np.asarray(t_bf16) == np.asarray(t_int8)).mean()
        assert agreement >= 0.8, (t_bf16, t_int8)

    def test_model_generate_end_to_end(self, models):
        _, m_int8 = models
        feats = np.random.default_rng(0).standard_normal(
            (1, m_int8.config.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        out = m_int8.generate(feats, np.ones((1, 50), np.int32), max_new_tokens=4)
        assert out.shape == (1, 4)

    def test_beams_with_int8_cache(self, models):
        _, m_int8 = models
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(0, 512, (1, 5)), jnp.int32)
        gen = GenerationConfig(
            max_new_tokens=4, eos_token_ids=(), pad_token_id=0, num_beams=2
        )
        tokens, scores = generate_beams(
            m_int8.decoder, {"params": m_int8.params["decoder"]},
            _embeds(m_int8, ids), gen,
        )
        assert tokens.shape == (1, 4)
        assert np.isfinite(np.asarray(scores)).all()
