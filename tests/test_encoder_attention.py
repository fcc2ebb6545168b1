"""Layout-native encoder attention kernel vs the XLA naive oracle
(interpret mode on the CPU mesh)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tiny_audio_tpu.models.layers import attention as naive_attention
from tiny_audio_tpu.ops.encoder_attention import (
    _heads_per_group,
    encoder_attention_tpu,
)


def _oracle(q, k, v, mask, h, d):
    b, t, _ = q.shape
    qh, kh, vh = (x.reshape(b, t, h, d) for x in (q, k, v))
    m = mask.astype(bool)[:, None, None, :]
    return naive_attention(qh, kh, vh, mask=m).reshape(b, t, h * d)


@pytest.mark.parametrize(
    "b,t,h,d",
    [
        (2, 256, 4, 64),     # exact tile
        (2, 300, 4, 64),     # padded tail
        (1, 512, 20, 64),    # encoder head count
        (2, 256, 4, 128),    # decoder-ish head dim
    ],
)
def test_matches_naive(b, t, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[:, -t // 4 :] = 0  # padded tail frames
    got = encoder_attention_tpu(
        q, k, v, jnp.asarray(mask), num_heads=h, interpret=True
    )
    expected = _oracle(q, k, v, jnp.asarray(mask), h, d)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(expected)[valid], atol=2e-3
    )


def test_per_row_mask_lengths():
    """Different real lengths per batch row."""
    b, t, h, d = 2, 256, 2, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[0, 100:] = 0
    mask[1, 200:] = 0
    got = encoder_attention_tpu(q, q, q, jnp.asarray(mask), num_heads=h,
                                interpret=True)
    expected = _oracle(q, q, q, jnp.asarray(mask), h, d)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(expected)[valid], atol=2e-3
    )


def test_heads_per_group_divides():
    for h in (4, 20, 16):
        hg = _heads_per_group(1536, 64, h)
        assert h % hg == 0 and hg >= 1


def test_encoder_module_cpu_path_unchanged():
    """On CPU the encoder still uses the naive path (kernel is TPU-only
    unless interpret=True) — full forward stays finite/deterministic."""
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel

    cfg = tiny_test_config(model_dtype="float32")
    model = ASRModel(cfg, seed=0)
    feats = np.random.default_rng(0).standard_normal(
        (1, cfg.encoder.num_mel_bins, 50)
    ).astype(np.float32)
    h1 = model.encoder.apply(
        {"params": model.params["encoder"]}, jnp.asarray(feats),
        frame_mask=jnp.ones((1, 50), jnp.int32),
    )
    h2 = model.encoder.apply(
        {"params": model.params["encoder"]}, jnp.asarray(feats),
        frame_mask=jnp.ones((1, 50), jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    assert np.isfinite(np.asarray(h1)).all()


def test_extreme_scores_inside_window():
    """The constant-shift softmax must stay exact across its documented
    domain: row maxima up to ~SOFTMAX_CLAMP and rows whose max sits far
    below zero (fp32 exp absorbs ~87 nats under the shift)."""
    b, t, h, d = 1, 256, 2, 64
    rng = np.random.default_rng(2)
    # scale q so scores reach ~ +-8*sqrt(d)/sqrt(d)*8 ~ +-64: near the clamp
    q = jnp.asarray(8.0 * rng.standard_normal((b, t, h * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    got = encoder_attention_tpu(q, k, v, jnp.asarray(mask), num_heads=h,
                                interpret=True)
    expected = _oracle(q, k, v, jnp.asarray(mask), h, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-3)
    # strongly negative rows: shift q so maxima land ~ -30
    q2 = q - 4.0
    got2 = encoder_attention_tpu(q2, k, v, jnp.asarray(mask), num_heads=h,
                                 interpret=True)
    expected2 = _oracle(q2, k, v, jnp.asarray(mask), h, d)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(expected2), atol=2e-3)


def test_fully_masked_row_returns_zeros_not_nan():
    """A zero-length batch entry (kv_mask all 0) hits the denominator
    guard: output is exactly 0 — the documented degraded mode (the naive
    oracle returns mean(v) there; those rows are padding and sliced off
    downstream, but they must never be NaN/Inf)."""
    b, t, h, d = 2, 256, 2, 64
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, t, h * d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[1, :] = 0
    out = np.asarray(encoder_attention_tpu(x, x, x, jnp.asarray(mask),
                                           num_heads=h, interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[1], np.zeros_like(out[1]))


# ----------------------------------------------- window calibration (ADVICE)


def test_calibration_window_accepts_normal_and_flags_hot(tiny_config):
    """debug.calibrate_attention_window must pass a freshly-initialized
    checkpoint (scores well inside the constant-shift window) and flag a
    'hot' one whose attention logits exceed SOFTMAX_CLAMP — the guard that
    protects the TPU kernel's domain assumption on imported checkpoints."""
    import jax.numpy as jnp

    from tiny_audio_tpu.debug import calibrate_attention_window
    from tiny_audio_tpu.models.asr import ASRModel

    model = ASRModel(tiny_config, seed=0)
    report = calibrate_attention_window(model, seconds=0.5)
    assert report["ok"], report
    assert len(report["per_layer"]) == tiny_config.encoder.num_layers
    assert report["window"][0] < report["row_max_lo"]
    assert report["row_max_hi"] < report["window"][1]

    # heat the q projection: scores scale linearly with W_q, so x1e4 blows
    # a ~O(1) row max far past the +80 clamp
    enc = model.params["encoder"]
    enc["layers"]["q_proj"]["kernel"] = (
        enc["layers"]["q_proj"]["kernel"].astype(jnp.float32) * 1e4
    ).astype(model.dtype)
    hot = calibrate_attention_window(model, seconds=0.5)
    assert not hot["ok"], hot
    assert hot["row_max_hi"] > report["window"][1]
