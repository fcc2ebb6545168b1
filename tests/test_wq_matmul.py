"""Weight-only int8 matmul: quantizer invariants + kernel-vs-oracle parity
(interpret mode on CPU; the real-TPU run is scripts/bench_wq_kernel.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.ops.wq_matmul import (
    quantization_error,
    quantize_weight,
    wq_matmul,
    wq_matmul_xla,
)


class TestQuantizeWeight:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((256, 384)).astype(np.float32)
        w_i8, scale = quantize_weight(w)
        assert w_i8.dtype == jnp.int8 and scale.dtype == jnp.float32
        deq = np.asarray(w_i8, np.float32) * np.asarray(scale)[None, :]
        # symmetric per-channel: error <= scale/2 per entry
        assert np.max(np.abs(deq - w) / np.asarray(scale)[None, :]) <= 0.5 + 1e-6

    def test_zero_column_guard(self):
        w = np.zeros((64, 8), np.float32)
        w_i8, scale = quantize_weight(w)
        assert np.all(np.asarray(w_i8) == 0)
        assert np.all(np.isfinite(np.asarray(scale)))

    def test_extreme_channel_scales_independent(self):
        w = np.ones((16, 2), np.float32)
        w[:, 0] *= 1e-4
        w[:, 1] *= 1e4
        w_i8, scale = quantize_weight(w)
        assert np.all(np.asarray(w_i8) == 127)  # both saturate exactly

    def test_error_probe(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((128, 64)).astype(np.float32)
        err = quantization_error(w, n_probe=64)
        assert 0 < err["rel_fro_error"] < 0.02  # int8 ~ 0.2-0.5% typical


class TestKernelParity:
    @pytest.mark.parametrize(
        "b,k,n",
        [
            (1, 128, 256),     # batch 1, padded to sublanes
            (48, 256, 512),    # serving batch, one tile
            (48, 256, 1280),   # multi-tile N
            (3, 128, 700),     # ragged N (pad + slice)
        ],
    )
    def test_kernel_matches_oracle(self, b, k, n):
        rng = np.random.default_rng(b * 1000 + n)
        x = jnp.asarray(
            rng.standard_normal((b, k)).astype(np.float32), jnp.bfloat16
        )
        w_i8, scale = quantize_weight(
            rng.standard_normal((k, n)).astype(np.float32)
        )
        want = wq_matmul_xla(x, w_i8, scale)
        got = wq_matmul(x, w_i8, scale, interpret=True)
        assert got.shape == (b, n) and got.dtype == jnp.bfloat16
        # identical convert/accumulate/scale recipe -> exact match
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )

    def test_quantized_matmul_close_to_full_precision(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(
            rng.standard_normal((8, 256)).astype(np.float32), jnp.bfloat16
        )
        w = rng.standard_normal((256, 512)).astype(np.float32)
        w_i8, scale = quantize_weight(w)
        got = np.asarray(
            wq_matmul(x, w_i8, scale, interpret=True), np.float32
        )
        ref = np.asarray(x, np.float32) @ w
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.02  # int8 weight error + bf16 rounding
