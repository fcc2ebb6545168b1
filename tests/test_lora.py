"""LoRA stage-2 fine-tuning: param shapes, zero-init identity, gradient
routing (base frozen / adapters train), adapter persistence.

Reference semantics: PEFT LoRA on the frozen LM with the projector optionally
frozen (``/root/reference/tiny_audio/asr_modeling.py:96-131,176-186``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.asr import ASRModel, merge_lora, split_lora


def _lora_config(**kw):
    cfg = tiny_test_config(
        use_lora=True, lora_rank=4, lora_alpha=8,
        model_dtype="float32", **kw,
    )
    return cfg


def _tiny_batch(model, b=2, t_mel=50):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (b, model.config.encoder.num_mel_bins, t_mel)
    ).astype(np.float32)
    mel_mask = np.ones((b, t_mel), np.int32)
    n_audio = model._num_audio_tokens(t_mel)
    ids = model.build_prompt_ids(n_audio)
    ids = np.asarray(ids + [5, 6, 7], np.int32)[None, :].repeat(b, 0)
    labels = np.full_like(ids, -100)
    labels[:, -3:] = ids[:, -3:]
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones_like(jnp.asarray(ids)),
        "labels": jnp.asarray(labels),
        "input_features": jnp.asarray(feats),
        "audio_attention_mask": jnp.asarray(mel_mask),
    }


class TestLoRAParams:
    def test_lora_params_created(self):
        model = ASRModel(_lora_config(), seed=0)
        layers = model.params["decoder"]["layers"]
        assert "q_proj_lora_a" in layers and "q_proj_lora_b" in layers
        L = model.config.decoder.num_layers
        r = model.config.lora_rank
        assert layers["q_proj_lora_a"].shape == (
            L, model.config.decoder.hidden_size, r
        )

    def test_no_lora_params_when_disabled(self):
        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        assert "q_proj_lora_a" not in model.params["decoder"]["layers"]

    def test_zero_init_is_identity(self):
        """lora_b starts at zero, so outputs match the non-LoRA model."""
        base = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        lora = ASRModel(_lora_config(), seed=0)
        # graft base weights into the lora model's base leaves
        dec_base, dec_lora = split_lora(lora.params["decoder"])
        lora.params["decoder"] = merge_lora(base.params["decoder"], dec_lora)
        lora.params["encoder"] = base.params["encoder"]
        lora.params["projector"] = base.params["projector"]

        batch = _tiny_batch(base)
        l0, _ = base.compute_loss(base.params, batch, train=False)
        l1, _ = lora.compute_loss(lora.params, batch, train=False)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)

    def test_nonzero_b_changes_output(self):
        model = ASRModel(_lora_config(), seed=0)
        batch = _tiny_batch(model)
        l0, _ = model.compute_loss(model.params, batch, train=False)
        model.params["decoder"]["layers"]["q_proj_lora_b"] = (
            model.params["decoder"]["layers"]["q_proj_lora_b"] + 0.5
        )
        l1, _ = model.compute_loss(model.params, batch, train=False)
        assert float(l0) != pytest.approx(float(l1))


class TestLoRAGradients:
    def test_gradients_flow_to_lora_not_base(self):
        model = ASRModel(_lora_config(), seed=0)
        assert model.config.freeze_language_model
        batch = _tiny_batch(model)

        def loss_fn(p):
            loss, _ = model.compute_loss(p, batch, train=False)
            return loss

        grads = jax.grad(loss_fn)(model.params)
        layers = grads["decoder"]["layers"]
        # adapter A sees gradient (B is zero so dL/dB != 0, dL/dA == 0 at init;
        # check B instead, which receives gradient through the nonzero A path)
        assert float(jnp.abs(layers["q_proj_lora_b"]).max()) > 0
        # frozen base kernels get exactly zero
        assert float(jnp.abs(layers["q_proj"]["kernel"]).max()) == 0
        assert float(jnp.abs(grads["encoder"]["layers"]["q_proj"]["kernel"]).max()) == 0
        # projector still trains
        flat = jax.tree_util.tree_leaves(grads["projector"])
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)

    def test_freeze_projector_stage(self):
        from tiny_audio_tpu.train.optim import param_labels

        cfg = _lora_config(freeze_projector=True)
        model = ASRModel(cfg, seed=0)
        labels = param_labels(model.params, cfg)
        flat = jax.tree_util.tree_leaves(labels["projector"])
        assert all(lb == "frozen" for lb in flat)
        dec_labels = jax.tree_util.tree_leaves_with_path(labels["decoder"])
        lora_lbls = [
            v for path, v in dec_labels if any("lora" in str(getattr(k, "key", k)) for k in path)
        ]
        assert lora_lbls and all(lb.startswith("decoder_") for lb in lora_lbls)


class TestAdapterPersistence:
    def test_save_load_roundtrip(self, tmp_path):
        model = ASRModel(_lora_config(), seed=0)
        model.params["decoder"]["layers"]["v_proj_lora_b"] = (
            model.params["decoder"]["layers"]["v_proj_lora_b"] + 0.25
        )
        model.save_pretrained(tmp_path)
        assert (tmp_path / "adapter.msgpack").exists()

        loaded = ASRModel.from_pretrained(tmp_path)
        assert loaded.config.use_lora
        np.testing.assert_allclose(
            np.asarray(loaded.params["decoder"]["layers"]["v_proj_lora_b"]),
            np.asarray(model.params["decoder"]["layers"]["v_proj_lora_b"]),
        )

    def test_stage1_checkpoint_loads_into_lora_model(self, tmp_path):
        """Train projector first (no LoRA), then attach LoRA on reload —
        the reference's stage-1 -> stage-2 flow."""
        stage1 = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        stage1.save_pretrained(tmp_path)

        cfg = _lora_config()
        cfg.save_pretrained(tmp_path)  # overwrite config with LoRA enabled
        stage2 = ASRModel.from_pretrained(tmp_path)
        assert "q_proj_lora_a" in stage2.params["decoder"]["layers"]
        np.testing.assert_allclose(
            np.asarray(stage2.params["decoder"]["layers"]["q_proj"]["kernel"]),
            np.asarray(stage1.params["decoder"]["layers"]["q_proj"]["kernel"]),
        )

    def test_split_merge_roundtrip(self):
        model = ASRModel(_lora_config(), seed=0)
        base, lora = split_lora(model.params["decoder"])
        assert lora and base
        merged = merge_lora(base, lora)
        flat_a = jax.tree_util.tree_leaves(model.params["decoder"])
        flat_b = jax.tree_util.tree_leaves(merged)
        assert len(flat_a) == len(flat_b)
