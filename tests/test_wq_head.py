"""W8A8 LM-head kernel (ops/wq_head.py) + enable_w8a8_head integration.

The Pallas kernel is validated in interpret mode against the XLA oracle
(identical quantization semantics), the quantizers against their algebraic
contracts, and the decode path end-to-end on the tiny config (on CPU the
auto dispatch takes the XLA W8A8 path — same numerics as the kernel).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.ops.wq_head import (
    NT_HEAD,
    quantize_act,
    quantize_head_w8a8,
    w8a8_matmul,
    w8a8_matmul_xla,
)
from tiny_audio_tpu.pipeline import ASRPipeline


def _clip(seed: int, n: int = 12000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


class TestQuantizers:
    def test_head_quant_roundtrip(self):
        rng = np.random.default_rng(0)
        head = rng.standard_normal((64, 300)).astype(np.float32) * 0.02
        wt_i8, scale = quantize_head_w8a8(head)
        # transposed + padded to the tile
        assert wt_i8.shape == (NT_HEAD, 64)
        assert scale.shape == (NT_HEAD,)
        assert wt_i8.dtype == jnp.int8
        deq = np.asarray(wt_i8, np.float32)[:300] * np.asarray(scale)[:300, None]
        rel = np.linalg.norm(deq - head.T) / np.linalg.norm(head)
        assert rel < 0.007  # per-channel int8 round-off
        # pad rows: zero weight AND zero scale -> exactly-zero logits
        assert np.all(np.asarray(wt_i8[300:]) == 0)
        assert np.all(np.asarray(scale[300:]) == 0)

    def test_act_quant_per_row(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 64)).astype(np.float32) * np.array(
            [[0.1], [1.0], [10.0], [100.0]], np.float32
        )
        x_i8, sx = quantize_act(x)
        assert x_i8.dtype == jnp.int8 and sx.shape == (4, 1)
        deq = np.asarray(x_i8, np.float32) * np.asarray(sx)
        # per-row scaling keeps relative error uniform across magnitudes
        for r in range(4):
            rel = np.linalg.norm(deq[r] - x[r]) / np.linalg.norm(x[r])
            assert rel < 0.01, r
        # extremes hit the full int8 range per row
        assert np.abs(np.asarray(x_i8)).max(axis=1).min() == 127

    def test_zero_row_guarded(self):
        x = np.zeros((2, 32), np.float32)
        x_i8, sx = quantize_act(x)
        assert np.all(np.asarray(x_i8) == 0) and np.all(np.asarray(sx) > 0)


class TestKernel:
    def test_interpret_matches_xla_oracle(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((5, 128)) * 2.0, jnp.bfloat16)
        head = rng.standard_normal((128, 2500)).astype(np.float32) * 0.02
        wt_i8, scale = quantize_head_w8a8(head)
        got = w8a8_matmul(x, wt_i8, scale, interpret=True)
        want = w8a8_matmul_xla(x, wt_i8, scale)
        assert got.shape == want.shape == (5, wt_i8.shape[0])
        # identical int8 inputs + int32 accumulate: bf16-exact
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )

    def test_quantization_error_bounded(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((8, 256)).astype(np.float32)
        head = rng.standard_normal((256, 4096)).astype(np.float32) * 0.02
        wt_i8, scale = quantize_head_w8a8(head)
        got = np.asarray(
            w8a8_matmul_xla(jnp.asarray(x, jnp.bfloat16), wt_i8, scale),
            np.float32,
        )[:, :4096]
        ref = x @ head
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.02  # W8A8 double-quantization level


class TestDecodeIntegration:
    @pytest.fixture(scope="class")
    def pipe(self):
        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.enable_w8a8_head()
        return ASRPipeline(model)

    def test_collection_shapes(self, pipe):
        model = pipe.model
        cfg = model.decoder.cfg
        n_pad = -(-cfg.vocab_size // NT_HEAD) * NT_HEAD
        assert model.wq["head_t_i8"].shape == (n_pad, cfg.hidden_size)
        assert model.wq["head_w8a8_scale"].shape == (n_pad,)
        # layer matmuls NOT quantized by this mode
        assert "layers" not in model.wq

    def test_generate_runs_and_is_deterministic(self, pipe):
        a = _clip(1)
        t1 = pipe.transcribe_batch([a])[0]
        t2 = pipe.transcribe_batch([a])[0]
        assert isinstance(t1, str) and t1 == t2

    def test_tracks_bf16_decode(self, pipe):
        """W8A8 head only flips near-tie argmaxes on a random tiny model;
        the token trajectory must stay close to the bf16 decode."""
        model = pipe.model
        feats = pipe.processor.extract_features([_clip(2)])
        kw = dict(mel_length=int(np.max(feats["mel_lengths"])))
        toks_q = model.generate(
            feats["input_features"], feats["audio_attention_mask"], **kw
        )
        saved, model.wq = model.wq, None
        try:
            toks_fp = model.generate(
                feats["input_features"], feats["audio_attention_mask"], **kw
            )
        finally:
            model.wq = saved
        agree = float(np.mean(toks_q == toks_fp))
        assert agree >= 0.5, (toks_q, toks_fp)

    def test_composes_with_wq_decode(self):
        """Both collections together: layer matmuls take the weight-only
        path, logits the W8A8 head; decode still runs deterministically."""
        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.enable_wq_decode()
        model.enable_w8a8_head()
        assert "layers" in model.wq and "head_t_i8" in model.wq
        pipe = ASRPipeline(model)
        a = _clip(4)
        assert pipe.transcribe_batch([a])[0] == pipe.transcribe_batch([a])[0]

    def test_handler_env_toggle(self, monkeypatch):
        from tiny_audio_tpu.handler import EndpointHandler

        monkeypatch.setenv("TA_W8A8_HEAD", "1")
        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        h = EndpointHandler(pipeline=ASRPipeline(model))
        assert h.pipe.model.wq is not None
        assert "head_t_i8" in h.pipe.model.wq
