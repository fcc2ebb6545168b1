"""Beam search: k=1 equals greedy; beams improve (or match) sequence score;
EOS freezing; model-level dispatch via num_beams."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tiny_audio_tpu.config import tiny_test_config
from tiny_audio_tpu.generation import GenerationConfig, generate_beams, generate_tokens
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.models.decoder import Qwen3Decoder


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(model_dtype="float32")
    model = ASRModel(cfg, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.decoder.vocab_size, (2, 6)), jnp.int32)
    embeds = model.decoder.apply(
        {"params": model.params["decoder"]}, ids, method=Qwen3Decoder.embed
    )
    return model, embeds, ids


def _sequence_logprob(model, embeds, tokens):
    """Score a generated continuation under the model (teacher forcing)."""
    dec = model.decoder
    params = {"params": model.params["decoder"]}
    tok_embeds = dec.apply(params, tokens, method=Qwen3Decoder.embed)
    full = jnp.concatenate([embeds, tok_embeds], axis=1)
    t = full.shape[1]
    positions = jnp.broadcast_to(jnp.arange(t), (full.shape[0], t))
    logits, _ = dec.apply(
        params, full, positions,
        padding_mask=jnp.ones(full.shape[:2], jnp.int32),
    )
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t0 = embeds.shape[1]
    total = 0.0
    out = []
    for b in range(tokens.shape[0]):
        score = 0.0
        for i in range(tokens.shape[1]):
            score += float(lp[b, t0 + i - 1, int(tokens[b, i])])
        out.append(score)
    return np.array(out)


class TestBeamSearch:
    def test_k1_defined_and_matches_greedy(self, setup):
        model, embeds, ids = setup
        gen_g = GenerationConfig(max_new_tokens=6, eos_token_ids=(), pad_token_id=0)
        greedy, _ = generate_tokens(
            model.decoder, {"params": model.params["decoder"]}, embeds, ids, gen_g
        )
        gen_b = GenerationConfig(
            max_new_tokens=6, eos_token_ids=(), pad_token_id=0, num_beams=1
        )
        beams, _ = generate_beams(
            model.decoder, {"params": model.params["decoder"]}, embeds, gen_b
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beams))

    def test_beams_never_worse_than_greedy(self, setup):
        model, embeds, ids = setup
        gen_g = GenerationConfig(max_new_tokens=5, eos_token_ids=(), pad_token_id=0)
        greedy, _ = generate_tokens(
            model.decoder, {"params": model.params["decoder"]}, embeds, ids, gen_g
        )
        gen_b = GenerationConfig(
            max_new_tokens=5, eos_token_ids=(), pad_token_id=0,
            num_beams=4, length_penalty=0.0,  # pure sum-logprob comparison
        )
        beams, scores = generate_beams(
            model.decoder, {"params": model.params["decoder"]}, embeds, gen_b
        )
        g_scores = _sequence_logprob(model, embeds, greedy)
        b_scores = _sequence_logprob(model, embeds, beams)
        assert (b_scores >= g_scores - 1e-3).all()
        # returned score matches the recomputed teacher-forced score
        np.testing.assert_allclose(np.asarray(scores), b_scores, atol=1e-2)

    def test_eos_freezes_beam(self, setup):
        model, embeds, ids = setup
        gen_g = GenerationConfig(max_new_tokens=8, eos_token_ids=(), pad_token_id=0)
        greedy, _ = generate_tokens(
            model.decoder, {"params": model.params["decoder"]}, embeds, ids, gen_g
        )
        eos = int(np.asarray(greedy)[0, 2])  # force an early EOS
        gen_b = GenerationConfig(
            max_new_tokens=8, eos_token_ids=(eos,), pad_token_id=0, num_beams=2
        )
        beams, _ = generate_beams(
            model.decoder, {"params": model.params["decoder"]}, embeds, gen_b
        )
        arr = np.asarray(beams)
        for row in arr:
            hits = np.where(row == eos)[0]
            if len(hits):
                assert (row[hits[0] + 1 :] == 0).all()  # pad after EOS

    def test_model_generate_dispatches_beams(self, setup):
        model, _, _ = setup
        feats = np.random.default_rng(0).standard_normal(
            (1, model.config.encoder.num_mel_bins, 50)
        ).astype(np.float32)
        mask = np.ones((1, 50), np.int32)
        out = model.generate(feats, mask, num_beams=2, max_new_tokens=4)
        assert out.shape == (1, 4)
