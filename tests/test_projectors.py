"""Projector contracts: output-length formulas, shapes, MoE routing/aux."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.projectors import (
    PROJECTOR_CLASSES,
    create_projector,
    frame_stack,
)


def _make(projector_type, **overrides):
    cfg = tiny_test_config(projector_type=projector_type, **overrides)
    proj = create_projector(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    return cfg, proj


def _init_and_run(proj, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0)}
    if train:
        rngs.update(jitter=jax.random.PRNGKey(1), dropout=jax.random.PRNGKey(2))
    variables = proj.init(rngs, x, train=train)
    run_rngs = {k: v for k, v in rngs.items() if k != "params"}
    out, aux = proj.apply(variables, x, train=train, rngs=run_rngs)
    return variables, out, aux


# -- output-length formulas (exact integer ports of reference projectors.py) --

@pytest.mark.parametrize("length", [1500, 100, 99, 16, 15, 4])
def test_mlp_moe_output_length(length):
    for ptype in ("mlp", "moe"):
        _, proj = _make(ptype)
        k = 4
        assert proj.get_output_length(length) == (length - k) // k + 1


@pytest.mark.parametrize("length", [1500, 100, 99, 16, 5])
def test_mosa_output_length(length):
    _, proj = _make("mosa")
    expected = length
    for _ in range(2):
        expected = (expected + 2 * 1 - 3) // 2 + 1
    assert proj.get_output_length(length) == expected


@pytest.mark.parametrize("length", [1500, 100, 99, 30, 15, 14, 1])
def test_qformer_output_length(length):
    _, proj = _make("qformer")
    nblocks = -(-length // 15)
    assert proj.get_output_length(length) == nblocks * 3


def test_output_length_on_arrays():
    for ptype in PROJECTOR_CLASSES:
        _, proj = _make(ptype)
        lens = np.array([1500, 99, 15])
        out = proj.get_output_length(lens)
        assert out.tolist() == [int(proj.get_output_length(int(n))) for n in lens]


# -- forward shapes -----------------------------------------------------------

@pytest.mark.parametrize("ptype", list(PROJECTOR_CLASSES))
def test_forward_shape(ptype, rng):
    cfg, proj = _make(ptype)
    t = 60
    x = jnp.asarray(rng.standard_normal((2, t, cfg.encoder_dim)), jnp.float32)
    _, out, aux = _init_and_run(proj, x)
    expected_t = int(proj.get_output_length(t))
    assert out.shape == (2, expected_t, cfg.llm_dim)
    assert np.isfinite(np.asarray(out)).all()
    assert float(aux) == 0.0  # eval mode: no aux loss


def test_frame_stack_truncation(rng):
    x = jnp.asarray(rng.standard_normal((1, 10, 4)), jnp.float32)
    out = frame_stack(x, 4)
    assert out.shape == (1, 2, 16)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(x[0, :4]).reshape(-1))
    np.testing.assert_array_equal(np.asarray(out[0, 1]), np.asarray(x[0, 4:8]).reshape(-1))


# -- MoE specifics ------------------------------------------------------------

def test_moe_aux_loss_in_training(rng):
    cfg, proj = _make("moe")
    x = jnp.asarray(rng.standard_normal((2, 32, cfg.encoder_dim)), jnp.float32)
    _, out, aux = _init_and_run(proj, x, train=True)
    assert float(aux) > 0.0
    assert np.isfinite(float(aux))
    assert np.isfinite(np.asarray(out)).all()


def test_moe_dense_dispatch_matches_loop_reference(rng):
    """Oracle: dense einsum dispatch == explicit per-expert gather/scatter."""
    cfg, proj = _make("moe")
    x = jnp.asarray(rng.standard_normal((1, 16, cfg.encoder_dim)), jnp.float32)
    variables, out, _ = _init_and_run(proj, x, train=False)

    p = variables["params"]
    from tiny_audio_tpu.models.layers import rms_norm

    stacked = frame_stack(x, cfg.projector_pool_stride)
    normed = rms_norm(stacked, p["norm"]["weight"], 1e-6)
    flat = np.asarray(normed).reshape(-1, normed.shape[-1])

    logits = flat @ np.asarray(p["router"]["kernel"])
    probs = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    top_w, top_idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    top_w = np.asarray(top_w / (top_w.sum(-1, keepdims=True) + 1e-6))
    top_idx = np.asarray(top_idx)

    def adapter(x_, w1, b1, w2, b2):
        h = x_ @ w1 + b1
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
        return h @ w2 + b2

    sp = p["shared_expert"]
    ref = adapter(flat, np.asarray(sp["fc1"]["kernel"]), np.asarray(sp["fc1"]["bias"]),
                  np.asarray(sp["fc2"]["kernel"]), np.asarray(sp["fc2"]["bias"]))
    w1 = np.asarray(p["experts_fc1_kernel"]); b1 = np.asarray(p["experts_fc1_bias"])
    w2 = np.asarray(p["experts_fc2_kernel"]); b2 = np.asarray(p["experts_fc2_bias"])
    for tok in range(flat.shape[0]):
        for j in range(cfg.num_experts_per_tok):
            e = top_idx[tok, j]
            ref[tok] += top_w[tok, j] * adapter(flat[tok], w1[e], b1[e], w2[e], b2[e])

    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, cfg.llm_dim), ref, atol=1e-4, rtol=1e-3
    )


def test_moe_jitter_changes_routing_only_in_train(rng):
    cfg, proj = _make("moe")
    x = jnp.asarray(rng.standard_normal((1, 16, cfg.encoder_dim)), jnp.float32)
    variables = proj.init(
        {"params": jax.random.PRNGKey(0), "jitter": jax.random.PRNGKey(1)}, x, train=True
    )
    out_eval_1, _ = proj.apply(variables, x, train=False)
    out_eval_2, _ = proj.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval_1), np.asarray(out_eval_2))
