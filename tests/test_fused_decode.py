"""Fused decode step (in-kernel cache ownership) vs the module path.

Interpret-mode Pallas on CPU, teacher-forced so ulp drift can't compound
through greedy feedback.  The bf16 contract is tight logits agreement and
bit-identical cache rows; int8 additionally tolerates +-3 quantization
counts (few-ulp K/V differences from bf16 reassociation in the fused layer
math land on different rounding boundaries — scripts/check_decode_kernel_parity.py
carries the on-device version of the same contract).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import DecoderConfig
from tiny_audio_tpu.models.decoder import Qwen3Decoder
from tiny_audio_tpu.ops.fused_decode import flatten_cache, fused_decode_step


def _setup(kv_cache_dtype, qk_norm=True):
    cfg = DecoderConfig(
        vocab_size=97, hidden_size=128, num_layers=2, num_heads=2,
        num_kv_heads=1, head_dim=128, intermediate_size=160,
        max_position_embeddings=256, kv_cache_dtype=kv_cache_dtype,
        qk_norm=qk_norm,
    )
    dec = Qwen3Decoder(cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    variables = dec.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 4, 128), jnp.bfloat16),
        jnp.zeros((2, 4), jnp.int32),
    )
    return cfg, dec, variables, ids, rng


@pytest.mark.parametrize(
    "kvd,qk_norm",
    [("bfloat16", True), ("int8", True), ("bfloat16", False)],
)
def test_fused_step_matches_module(kvd, qk_norm):
    cfg, dec, variables, ids, rng = _setup(kvd, qk_norm)
    b, t = ids.shape
    steps = 3
    s = 16
    embeds = dec.apply(variables, ids, method=Qwen3Decoder.embed)
    cache = dec.init_cache(b, s, dtype=jnp.bfloat16)
    positions = jnp.arange(t)[None, :].repeat(b, 0)
    _, cache = dec.apply(
        variables, embeds, positions, cache=cache, cache_index=0,
        last_logit_only=True,
    )
    cache_mod = jax.tree.map(jnp.copy, cache)
    cache_fused = flatten_cache(jax.tree.map(jnp.copy, cache))
    teach = jnp.asarray(rng.integers(0, cfg.vocab_size, (steps, b)), jnp.int32)

    for i in range(steps):
        cur, pos = teach[i], jnp.int32(t + i)
        e = dec.apply(variables, cur[:, None], method=Qwen3Decoder.embed)
        kv_valid = (jnp.arange(s) < pos)[None, :].astype(jnp.int32)
        lg_m, cache_mod = dec.apply(
            variables, e, jnp.full((b, 1), pos, jnp.int32),
            step_kv_valid=kv_valid, cache=cache_mod, cache_index=pos,
        )
        lg_m = lg_m[:, 0].astype(jnp.float32)
        lg_f, cache_fused = fused_decode_step(
            variables["params"], cfg, cur, pos, cache_fused, interpret=True
        )

        drift = float(jnp.max(jnp.abs(lg_m - lg_f)))
        assert drift < 0.25, f"step {i}: logit drift {drift}"
        # the freshly appended cache row
        kf = cache_fused["k"][:, :, t + i].reshape(
            cfg.num_layers, b, cfg.num_kv_heads, cfg.head_dim
        )
        km = cache_mod["k"][:, :, t + i]
        if kvd == "int8":
            kd = int(jnp.max(jnp.abs(
                kf.astype(jnp.int32) - km.astype(jnp.int32)
            )))
            assert kd <= 3, f"step {i}: quant count diff {kd}"
            ks_f = cache_fused["k_scale"][:, :, t + i]
            ks_m = cache_mod["k_scale"][:, :, t + i]
            np.testing.assert_allclose(
                np.asarray(ks_f), np.asarray(ks_m), rtol=2e-2
            )
        else:
            # bf16-ulp drift measured at the scale of the LARGE operands:
            # rotary's k1*cos - k2*sin cancels, so near-zero elements carry
            # absolute error ~ulp(max|k|), not ulp(element)
            atol = 2 * float(jnp.max(jnp.abs(km.astype(jnp.float32)))) * 2**-8
            np.testing.assert_allclose(
                np.asarray(kf, np.float32), np.asarray(km, np.float32),
                atol=atol,
            )


def test_fused_availability_gating(monkeypatch):
    """TA_PALLAS_DECODE=2 must not activate the fused path off-TPU or with
    live LoRA; the default (env unset) is always the module path."""
    from tiny_audio_tpu.generation import _fused_decode_available

    cfg, dec, *_ = _setup("bfloat16")
    monkeypatch.delenv("TA_PALLAS_DECODE", raising=False)
    assert not _fused_decode_available(dec)
    monkeypatch.setenv("TA_PALLAS_DECODE", "2")
    on_tpu = jax.devices()[0].platform == "tpu"
    assert _fused_decode_available(dec) == on_tpu
