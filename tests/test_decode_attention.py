"""Pallas decode-attention kernel vs the XLA decode_step_attention oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.ops.attention import decode_step_attention
from tiny_audio_tpu.ops.decode_attention import decode_attention_tpu

B, S, HKV, GROUP, D = 2, 384, 4, 2, 128
HQ = HKV * GROUP


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.fixture(scope="module")
def tensors():
    rng = np.random.default_rng(0)
    return {
        "q": _rand(rng, B, 1, HQ, D),
        "cache_k": _rand(rng, B, S, HKV, D),
        "cache_v": _rand(rng, B, S, HKV, D),
        "fresh_k": _rand(rng, B, 1, HKV, D),
        "fresh_v": _rand(rng, B, 1, HKV, D),
    }


def _oracle(t, kv_len, k_scale=None, v_scale=None):
    kv_valid = (np.arange(S) < kv_len)[None, :].astype(np.int32)
    out = decode_step_attention(
        jnp.asarray(t["q"]), jnp.asarray(t["cache_k"]),
        jnp.asarray(t["cache_v"]), jnp.asarray(kv_valid),
        fresh_k=jnp.asarray(t["fresh_k"]), fresh_v=jnp.asarray(t["fresh_v"]),
        k_scale=None if k_scale is None else jnp.asarray(k_scale),
        v_scale=None if v_scale is None else jnp.asarray(v_scale),
    )
    return np.asarray(out)[:, 0]  # [B, Hq, D]


def _kernel_out(t, kv_len, k_scale=None, v_scale=None, cache_dtype=None):
    ck, cv = jnp.asarray(t["cache_k"]), jnp.asarray(t["cache_v"])
    if cache_dtype is not None:
        ck, cv = ck.astype(cache_dtype), cv.astype(cache_dtype)
    out = decode_attention_tpu(
        jnp.asarray(t["q"][:, 0]), ck, cv,
        jnp.asarray(t["fresh_k"][:, 0]), jnp.asarray(t["fresh_v"][:, 0]),
        jnp.int32(kv_len),
        k_scale=None if k_scale is None else jnp.asarray(k_scale),
        v_scale=None if v_scale is None else jnp.asarray(v_scale),
        interpret=True,
    )
    return np.asarray(out)


class TestDecodeAttentionKernel:
    @pytest.mark.parametrize("kv_len", [1, 100, 255, 256, 257, S - 1])
    def test_matches_oracle_fp32(self, tensors, kv_len):
        np.testing.assert_allclose(
            _kernel_out(tensors, kv_len), _oracle(tensors, kv_len),
            atol=2e-5, rtol=1e-5,
        )

    def test_int8_scales_match_oracle(self, tensors):
        rng = np.random.default_rng(1)
        # int8 cache with per-entry scales, fp32 arithmetic elsewhere
        k_scale = (0.5 + rng.random((B, S, HKV))).astype(np.float32)
        v_scale = (0.5 + rng.random((B, S, HKV))).astype(np.float32)
        t = dict(tensors)
        t["cache_k"] = rng.integers(-127, 128, (B, S, HKV, D)).astype(np.float32)
        t["cache_v"] = rng.integers(-127, 128, (B, S, HKV, D)).astype(np.float32)
        kv_len = 200
        got = _kernel_out(t, kv_len, k_scale, v_scale, cache_dtype=jnp.int8)
        want = _oracle(
            {**t,
             "cache_k": t["cache_k"].astype(np.int8),
             "cache_v": t["cache_v"].astype(np.int8)},
            kv_len, k_scale, v_scale,
        )
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-3)

    def test_tail_blocks_do_not_poison(self, tensors):
        """Uninitialized-slab guard: NaNs planted beyond kv_len must not
        reach the output (the kernel zero-fills skipped slabs)."""
        t = dict(tensors)
        bad = t["cache_v"].copy()
        bad[:, 300:] = np.nan
        t["cache_v"] = bad
        out = _kernel_out(t, 128)
        assert np.isfinite(out).all()
