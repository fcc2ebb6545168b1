"""GSPMD inference parity: tp-sharded generate must reproduce the
single-device tokens exactly (sharding rules change layout, not math)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.parallel.mesh import make_mesh, shard_params


@pytest.mark.slow
class TestShardedInference:
    def _generate(self, model, feats, mask):
        return np.asarray(model.generate(feats, mask, max_new_tokens=6))

    def test_tp2_matches_single_device(self):
        cfg = tiny_test_config(model_dtype="float32")
        model = ASRModel(cfg, seed=0)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal(
            (2, cfg.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        mask = np.ones((2, 50), np.int32)

        baseline = self._generate(model, feats, mask)

        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        sharded = ASRModel(cfg, seed=0)
        sharded.params = shard_params(model.params, mesh)
        with mesh:
            got = self._generate(sharded, feats, mask)

        np.testing.assert_array_equal(baseline, got)

    def test_moe_ep_sharding_matches(self):
        cfg = tiny_test_config(projector_type="moe", model_dtype="float32")
        model = ASRModel(cfg, seed=0)
        rng = np.random.default_rng(1)
        feats = rng.standard_normal(
            (1, cfg.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        mask = np.ones((1, 50), np.int32)
        baseline = self._generate(model, feats, mask)

        mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
        sharded = ASRModel(cfg, seed=0)
        sharded.params = shard_params(model.params, mesh)
        with mesh:
            got = self._generate(sharded, feats, mask)
        np.testing.assert_array_equal(baseline, got)

    def test_tp2_llama_family_matches(self):
        """qk_norm=False (Llama/SmolLM2 layout): the sharding rules must
        hold without the q_norm/k_norm leaves."""
        import dataclasses

        cfg = tiny_test_config(model_dtype="float32")
        cfg.decoder = dataclasses.replace(cfg.decoder, qk_norm=False)
        model = ASRModel(cfg, seed=0)
        rng = np.random.default_rng(2)
        feats = rng.standard_normal(
            (2, cfg.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        mask = np.ones((2, 50), np.int32)
        baseline = self._generate(model, feats, mask)

        mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
        sharded = ASRModel(cfg, seed=0)
        assert "q_norm" not in sharded.params["decoder"]["layers"]
        sharded.params = shard_params(model.params, mesh)
        with mesh:
            got = self._generate(sharded, feats, mask)
        np.testing.assert_array_equal(baseline, got)

    def test_tp2_gemma_family_matches(self):
        """Gemma-v1 knobs (zero-centered (1+w) norms, GeGLU, sqrt(hidden)
        embed normalizer): param paths are unchanged so the sharding rules
        must hold, and the normalizer — a scalar multiply on the activation
        path — must commute with the tp layout exactly."""
        import dataclasses

        cfg = tiny_test_config(model_dtype="float32")
        cfg.decoder = dataclasses.replace(
            cfg.decoder, qk_norm=False, rms_norm_offset=True,
            hidden_activation="gelu_tanh", embedding_normalizer=True,
        )
        model = ASRModel(cfg, seed=0)
        rng = np.random.default_rng(3)
        feats = rng.standard_normal(
            (2, cfg.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        mask = np.ones((2, 50), np.int32)
        baseline = self._generate(model, feats, mask)

        mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
        sharded = ASRModel(cfg, seed=0)
        sharded.params = shard_params(model.params, mesh)
        with mesh:
            got = self._generate(sharded, feats, mask)
        np.testing.assert_array_equal(baseline, got)
