"""Fused encoder FFN kernel vs the naive formula (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tiny_audio_tpu.ops.encoder_ffn import (
    BK,
    BM,
    encoder_ffn_tpu,
    fused_ffn_applicable,
    naive_ffn,
)


def _mats(m, d, f, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, d)).astype(dtype))
    w1 = jnp.asarray((rng.standard_normal((d, f)) / np.sqrt(d)).astype(dtype))
    b1 = jnp.asarray(rng.standard_normal(f).astype(dtype) * 0.1)
    w2 = jnp.asarray((rng.standard_normal((f, d)) / np.sqrt(f)).astype(dtype))
    b2 = jnp.asarray(rng.standard_normal(d).astype(dtype) * 0.1)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("m,d,f", [(BM, 256, BK), (2 * BM, 128, 2 * BK)])
def test_kernel_matches_naive(m, d, f):
    x, w1, b1, w2, b2 = _mats(m, d, f)
    got = encoder_ffn_tpu(x, w1, b1, w2, b2, True)
    want = naive_ffn(x, w1, b1, w2, b2, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)


def test_backward_matches_naive():
    x, w1, b1, w2, b2 = _mats(BM, 128, BK, seed=1)

    def f_kernel(*a):
        return jnp.sum(encoder_ffn_tpu(*a, True) ** 2)

    def f_naive(*a):
        return jnp.sum(naive_ffn(*a, dtype=jnp.float32) ** 2)

    g_kernel = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_naive = jax.grad(f_naive, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gk, gn in zip(g_kernel, g_naive):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gn),
                                   atol=5e-2, rtol=5e-3)


def test_applicability_gate():
    assert fused_ffn_applicable(1280, 5120)      # flagship encoder
    assert not fused_ffn_applicable(1280, 5000)  # ffn not BK-tileable
    assert not fused_ffn_applicable(100, 5120)   # lane-unaligned d_model


def test_module_naive_path_unchanged():
    """On CPU the encoder must keep the exact unfused numerics (the fused
    kernel is TPU-only): full forward finite + deterministic, and the
    param tree keeps the nn.Dense-compatible fc1/fc2 {kernel, bias}
    structure the converters rely on."""
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel

    cfg = tiny_test_config(model_dtype="float32")
    model = ASRModel(cfg, seed=0)
    layers = model.params["encoder"]["layers"]
    assert set(layers["fc1"].keys()) == {"kernel", "bias"}
    assert layers["fc1"]["kernel"].shape == (
        cfg.encoder.num_layers, cfg.encoder.d_model, cfg.encoder.ffn_dim
    )
    feats = np.random.default_rng(0).standard_normal(
        (1, cfg.encoder.num_mel_bins, 50)
    ).astype(np.float32)
    h1 = model.encoder.apply(
        {"params": model.params["encoder"]}, jnp.asarray(feats),
        frame_mask=jnp.ones((1, 50), jnp.int32),
    )
    assert np.isfinite(np.asarray(h1)).all()
