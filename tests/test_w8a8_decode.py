"""W8A8 full-decode integration (enable_w8a8_decode): every T==1 matmul —
layer projections and the LM head — runs int8 x int8 with per-row dynamic
activation quantization, while prefill/training/beams keep bf16 params.
The head kernel is oracle-tested in test_wq_head.py; the layer path here is
the pure-XLA ``w8a8_matmul_xla`` form (the variant measured FASTER than
both bf16 and the Pallas grid at layer shapes, scripts/bench_w8a8_decode.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.pipeline import ASRPipeline


@pytest.fixture(scope="module")
def w8a8_pipe():
    model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
    model.enable_w8a8_decode()
    return ASRPipeline(model)


def _clip(seed: int, n: int = 12000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


class TestW8A8Collection:
    def test_collection_shapes_transposed(self, w8a8_pipe):
        model = w8a8_pipe.model
        cfg = model.decoder.cfg
        wq = model.wq
        layers = wq["layers"]
        params = model.params["decoder"]["layers"]
        for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                     "gate_proj", "up_proj", "down_proj"):
            t_i8 = layers[f"{name}_t_i8"]
            s = layers[f"{name}_t_scale"]
            kern = params[name]["kernel"]  # [L, K, N]
            assert t_i8.dtype == jnp.int8 and s.dtype == jnp.float32
            # stored transposed: [L, N, K]
            assert t_i8.shape == (cfg.num_layers, kern.shape[2], kern.shape[1])
            assert s.shape == (cfg.num_layers, kern.shape[2])
        # head is the W8A8 head (tile-padded [N_pad, K]), not weight-only
        assert "head_t_i8" in wq and "head_i8" not in wq
        from tiny_audio_tpu.ops.wq_head import NT_HEAD

        v_pad = -(-cfg.vocab_size // NT_HEAD) * NT_HEAD
        assert wq["head_t_i8"].shape == (v_pad, cfg.hidden_size)
        assert wq["head_w8a8_scale"].shape == (v_pad,)

    def test_dequant_matches_params(self, w8a8_pipe):
        """The transposed int8 collection must be a faithful quantization
        of the CURRENT params."""
        model = w8a8_pipe.model
        kern = np.asarray(
            model.params["decoder"]["layers"]["q_proj"]["kernel"], np.float32
        )  # [L, K, N]
        deq = (
            np.asarray(model.wq["layers"]["q_proj_t_i8"], np.float32)
            * np.asarray(
                model.wq["layers"]["q_proj_t_scale"], np.float32
            )[:, :, None]
        ).transpose(0, 2, 1)  # [L, N, K] -> [L, K, N]
        rel = np.linalg.norm(deq - kern) / np.linalg.norm(kern)
        assert rel < 0.005  # int8 per-channel round-off


class TestW8A8DecodePaths:
    def test_generate_runs_and_is_deterministic(self, w8a8_pipe):
        a = _clip(1)
        t1 = w8a8_pipe.transcribe_batch([a])[0]
        t2 = w8a8_pipe.transcribe_batch([a])[0]
        assert isinstance(t1, str) and t1 == t2

    def test_w8a8_tracks_bf16_decode(self, w8a8_pipe):
        """W8A8 greedy decode agrees with full-precision decode on most
        tokens of a short budget (int8 weight+activation error only flips
        near-ties).  Raw token ids — transcripts can collapse distinct
        token sequences."""
        model = w8a8_pipe.model
        feats = w8a8_pipe.processor.extract_features([_clip(2)])
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

    def test_decode_step_actually_reads_w8a8_weights(self):
        """Zeroing the int8 layer weights (keeping bf16 params intact) must
        change a T==1 decode step's logits — proof the step reads the W8A8
        collection, not the bf16 kernels."""
        import jax

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        model.enable_w8a8_decode()
        dec = model.decoder

        def step_logits(wq):
            cache = dec.init_cache(1, 16, dtype=dec.dtype)
            embeds = dec.apply(
                {"params": model.params["decoder"]},
                jnp.asarray([[5]], jnp.int32),
                method=type(dec).embed,
            )
            kv_valid = jnp.zeros((1, 16), jnp.int32)
            logits, _ = dec.apply(
                {"params": model.params["decoder"], "wq": wq}, embeds,
                jnp.zeros((1, 1), jnp.int32), step_kv_valid=kv_valid,
                cache=cache, cache_index=0,
            )
            return np.asarray(logits, np.float32)

        base = step_logits(model.wq)
        zeroed = dict(model.wq)
        zeroed["layers"] = jax.tree.map(
            lambda x: (jnp.zeros_like(x) if x.dtype == jnp.int8 else x),
            model.wq["layers"],
        )
        assert not np.allclose(base, step_logits(zeroed))

    def test_w8a8_decode_step_applies_lora_delta(self):
        """LoRA serving + W8A8, one T==1 decode step: dense() adds the f32
        LoRA delta after the int8 base matmul, so bumping lora_b must
        change the decode-step logits."""
        import jax

        cfg = tiny_test_config(use_lora=True, lora_rank=4, lora_alpha=8,
                               model_dtype="float32")
        model = ASRModel(cfg, seed=0)
        model.enable_w8a8_decode()
        dec = model.decoder

        def step_logits(dec_params):
            cache = dec.init_cache(1, 16, dtype=dec.dtype)
            embeds = dec.apply(
                {"params": dec_params},
                jnp.asarray([[5]], jnp.int32),
                method=type(dec).embed,
            )
            kv_valid = jnp.zeros((1, 16), jnp.int32)
            logits, _ = dec.apply(
                {"params": dec_params, "wq": model.wq}, embeds,
                jnp.zeros((1, 1), jnp.int32), step_kv_valid=kv_valid,
                cache=cache, cache_index=0,
            )
            return np.asarray(logits, np.float32)

        base = step_logits(model.params["decoder"])

        def bump(path, x):
            return x + 0.5 if any("lora_b" in str(k) for k in path) else x

        bumped_params = jax.tree_util.tree_map_with_path(
            bump, model.params["decoder"]
        )
        assert not np.allclose(base, step_logits(bumped_params))

    def test_stream_tracks_batch_with_w8a8(self, w8a8_pipe):
        """Streaming and uniform decode read the SAME W8A8 collection; pin
        that the path works and stays on the batch trajectory initially
        (not token-exact: int8 logits flip near-ties between separately
        fused graphs — same contract as wq, test_wq_decode.py)."""
        a = _clip(3)
        want = w8a8_pipe.transcribe_batch([a])[0]
        feats = w8a8_pipe.processor.extract_features([a])
        got = "".join(
            w8a8_pipe.model.generate_streaming(
                feats["input_features"], feats["audio_attention_mask"]
            )
        ).strip()
        assert got and want
        prefix = 0
        for c1, c2 in zip(got, want):
            if c1 != c2:
                break
            prefix += 1
        assert prefix >= min(8, len(want)), (got, want)

    def test_engine_matches_batch_with_w8a8(self, w8a8_pipe):
        """Continuous-engine decode inherits the W8A8 collection via
        decoder_variables and stays token-exact vs the uniform path."""
        from tiny_audio_tpu.continuous import ContinuousEngine

        audios = [_clip(4), _clip(5, 9000)]
        want = w8a8_pipe.transcribe_batch(audios)
        eng = ContinuousEngine(w8a8_pipe, n_slots=4, chunk_steps=3,
                               start=False)
        futs = [eng.submit(a) for a in audios]
        for _ in range(100):
            admitted = eng._admit()
            if admitted:
                eng._prefill_and_insert(admitted)
            if eng._active():
                eng._decode_one_chunk()
            if all(f.done() for f in futs):
                break
        assert [f.result(timeout=5) for f in futs] == want

    def test_handler_flag_and_env(self, monkeypatch):
        """EndpointHandler(w8a8_decode=True) and TA_W8A8_DECODE=1 both
        enable the full collection."""
        from tiny_audio_tpu.handler import EndpointHandler

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        h = EndpointHandler(pipeline=ASRPipeline(model), w8a8_decode=True)
        assert "q_proj_t_i8" in h.pipe.model.wq["layers"]
        assert "head_t_i8" in h.pipe.model.wq

        model2 = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        monkeypatch.setenv("TA_W8A8_DECODE", "1")
        h2 = EndpointHandler(pipeline=ASRPipeline(model2))
        assert "q_proj_t_i8" in h2.pipe.model.wq["layers"]
