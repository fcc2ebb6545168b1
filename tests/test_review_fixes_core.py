"""Pinned regressions from the round-1 core-path review."""

import numpy as np
import pytest
import jax.numpy as jnp

from tiny_audio_tpu.config import ASRConfig, EncoderConfig, tiny_test_config
from tiny_audio_tpu.generation import GenerationConfig, generate_beams, generate_tokens
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.models.decoder import Qwen3Decoder
from tiny_audio_tpu.ops.attention import _block


class TestFlashBlockSizes:
    @pytest.mark.parametrize("t", [128, 512, 640, 768, 896, 1152, 1536, 2048])
    def test_block_divides_padded_length(self, t):
        b = _block(t)
        assert t % b == 0
        assert b in (128, 256, 512)


class TestConvLayerSync:
    def test_custom_encoder_stack_adopted(self):
        cfg = ASRConfig(
            encoder=EncoderConfig(conv_layers=((1, 3, 2), (1, 3, 2))),
        )
        assert cfg.encoder_conv_layers == [(1, 3, 2), (1, 3, 2)]

    def test_custom_formula_adopted_by_encoder(self):
        cfg = ASRConfig(encoder_conv_layers=[(1, 3, 2), (1, 3, 2)])
        assert tuple(cfg.encoder.conv_layers) == ((1, 3, 2), (1, 3, 2))

    def test_conflicting_customizations_raise(self):
        with pytest.raises(ValueError, match="disagree"):
            ASRConfig(
                encoder=EncoderConfig(conv_layers=((1, 3, 2),)),
                encoder_conv_layers=[(1, 5, 4)],
            )


@pytest.fixture(scope="module")
def model():
    return ASRModel(tiny_test_config(model_dtype="float32"), seed=0)


def _embeds(model, ids):
    return model.decoder.apply(
        {"params": model.params["decoder"]}, ids, method=Qwen3Decoder.embed
    )


class TestMinNewTokens:
    def _forced_eos(self, model, ids):
        """Find the token greedy decoding would emit first, use it as EOS."""
        gen = GenerationConfig(max_new_tokens=1, eos_token_ids=(), pad_token_id=0)
        tok, _ = generate_tokens(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), ids, gen,
        )
        return int(np.asarray(tok)[0, 0])

    def test_streaming_honors_min_new_tokens(self, model):
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 512, (1, 5)), jnp.int32)
        eos = self._forced_eos(model, ids)
        from tiny_audio_tpu.generation import stream_generate

        gen = GenerationConfig(
            max_new_tokens=8, min_new_tokens=3, eos_token_ids=(eos,),
            pad_token_id=0,
        )
        toks = list(stream_generate(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), ids, gen,
        ))
        assert len(toks) >= 3  # would be 0 without the fix

    def test_beams_honor_min_new_tokens(self, model):
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 512, (1, 5)), jnp.int32)
        eos = self._forced_eos(model, ids)
        gen = GenerationConfig(
            max_new_tokens=8, min_new_tokens=3, eos_token_ids=(eos,),
            pad_token_id=0, num_beams=2,
        )
        tokens, _ = generate_beams(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), gen,
        )
        row = np.asarray(tokens)[0]
        non_pad = row[row != 0]
        assert len(non_pad) >= 3


class TestBeamRepetitionPenalty:
    def test_penalty_changes_beams(self, model):
        rng = np.random.default_rng(2)
        ids = jnp.asarray(rng.integers(0, 512, (1, 5)), jnp.int32)
        base = GenerationConfig(
            max_new_tokens=8, eos_token_ids=(), pad_token_id=0, num_beams=2
        )
        t_plain, _ = generate_beams(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), base, input_ids=ids,
        )
        import dataclasses

        pen = dataclasses.replace(base, repetition_penalty=50.0)
        t_pen, _ = generate_beams(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), pen, input_ids=ids,
        )
        # a huge penalty must change the decoded sequence and kill repeats
        assert not np.array_equal(np.asarray(t_plain), np.asarray(t_pen))
        row = np.asarray(t_pen)[0]
        assert len(set(row.tolist())) == len(row)  # no token repeated


class TestLengthsWithPadEqualsEos:
    def test_length_includes_eos_even_when_pad(self, model):
        """Default tokenizer: pad_token_id IS an EOS id — length must still
        count the terminating token."""
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 512, (1, 5)), jnp.int32)
        gen0 = GenerationConfig(max_new_tokens=1, eos_token_ids=(), pad_token_id=0)
        first, _ = generate_tokens(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), ids, gen0,
        )
        eos = int(np.asarray(first)[0, 0])
        gen = GenerationConfig(
            max_new_tokens=8, eos_token_ids=(eos,), pad_token_id=eos
        )
        tokens, lengths = generate_tokens(
            model.decoder, {"params": model.params["decoder"]},
            _embeds(model, ids), ids, gen,
        )
        assert int(np.asarray(lengths)[0]) == 1  # EOS at step 0 -> length 1


class TestDiarizationWindowClamp:
    def test_window_does_not_cross_segment_end(self):
        from tiny_audio_tpu.diarization import sliding_windows

        sr = 16000
        audio = np.zeros(3 * sr, np.float32)
        audio[int(1.2 * sr):] = 1.0  # next speaker's audio after 1.2 s
        wins, spans = sliding_windows(audio, [(0.0, 1.0)], sr)
        # every window cut from segment (0, 1.0) must exclude the 1.0+ audio
        assert all(float(np.abs(w).max()) == 0.0 for w in wins)

    def test_short_blip_dropped_not_relabeled(self):
        from tiny_audio_tpu.diarization import LocalSpeakerDiarizer

        segs = [
            {"speaker": "SPEAKER_00", "start": 0.0, "end": 5.0},
            {"speaker": "SPEAKER_01", "start": 5.0, "end": 5.1},  # short blip
            {"speaker": "SPEAKER_00", "start": 5.1, "end": 8.0},
        ]
        out = LocalSpeakerDiarizer._merge_short(segs)
        assert all(s["speaker"] == "SPEAKER_00" for s in out)
        # the blip's time range may be absorbed only into a same-speaker run
        assert out[0]["end"] in (5.0, 8.0)


class TestKvCacheDtypeSync:
    def test_decoder_side_customization_wins(self):
        from tiny_audio_tpu.config import DecoderConfig

        cfg = tiny_test_config(model_dtype="float32")
        import dataclasses

        cfg.decoder = dataclasses.replace(cfg.decoder, kv_cache_dtype="int8")
        model = ASRModel(cfg, seed=0)
        cache = model.decoder.init_cache(1, 8, dtype=jnp.float32)
        assert cache["k"].dtype == jnp.int8

    def test_toplevel_customization_wins(self):
        cfg = tiny_test_config(model_dtype="float32", kv_cache_dtype="int8")
        model = ASRModel(cfg, seed=0)
        cache = model.decoder.init_cache(1, 8, dtype=jnp.float32)
        assert cache["k"].dtype == jnp.int8


class TestTrainerNanAbort:
    def test_sustained_nan_raises(self, tmp_path):
        from tiny_audio_tpu.train.collator import DataCollator
        from tiny_audio_tpu.train.data import synthetic_dataset
        from tiny_audio_tpu.train.optim import OptimizerConfig
        from tiny_audio_tpu.train.trainer import Trainer, TrainingConfig

        m = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        collator = DataCollator(
            m.tokenizer, m.projector,
            num_mel_bins=m.config.encoder.num_mel_bins,
        )
        rows = synthetic_dataset(8, seed=0, min_s=0.3, max_s=0.5)
        trainer = Trainer(
            m,
            TrainingConfig(
                output_dir=str(tmp_path), max_steps=100,
                per_device_batch_size=1, logging_steps=1000,
                save_steps=0, eval_steps=0,
                optimizer=OptimizerConfig(total_steps=100, warmup_steps=0,
                                          lr_scheduler_type="constant"),
            ),
            rows, collator,
        )
        # poison the params so every loss is NaN
        import jax

        trainer.model.params["projector"] = jax.tree_util.tree_map(
            lambda x: x * jnp.nan, trainer.model.params["projector"]
        )
        with pytest.raises(FloatingPointError, match="non-finite"):
            trainer.train()


class TestGradientCheckpointing:
    def test_remat_matches_plain_grads(self):
        """Remat must change memory, not math: identical loss and grads."""
        import jax

        cfg_plain = tiny_test_config(
            model_dtype="float32", freeze_language_model=False
        )
        cfg_remat = tiny_test_config(
            model_dtype="float32", freeze_language_model=False,
            gradient_checkpointing=True,
        )
        m_plain = ASRModel(cfg_plain, seed=0)
        m_remat = ASRModel(cfg_remat, seed=0)
        m_remat.params = jax.tree_util.tree_map(lambda x: x, m_plain.params)

        rng = np.random.default_rng(0)
        feats = rng.standard_normal(
            (2, cfg_plain.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        ids = np.asarray(
            m_plain.build_prompt_ids(m_plain._num_audio_tokens(50)) + [5, 6, 7],
            np.int32,
        )[None].repeat(2, 0)
        labels = np.full_like(ids, -100)
        labels[:, -3:] = ids[:, -3:]
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones_like(jnp.asarray(ids)),
            "labels": jnp.asarray(labels),
            "input_features": jnp.asarray(feats),
            "audio_attention_mask": jnp.ones((2, 50), jnp.int32),
        }

        def loss_of(m):
            def f(p):
                return m.compute_loss(p, batch, train=False)[0]
            return jax.value_and_grad(f)(m.params)

        l_plain, g_plain = loss_of(m_plain)
        l_remat, g_remat = loss_of(m_remat)
        np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_plain["decoder"]["layers"]["q_proj"]["kernel"]),
            np.asarray(g_remat["decoder"]["layers"]["q_proj"]["kernel"]),
            atol=1e-5,
        )
