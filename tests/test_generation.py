"""Generation loop vs naive full-forward oracle decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.config import DecoderConfig
from tiny_audio_tpu.generation import GenerationConfig, generate_tokens, stream_generate
from tiny_audio_tpu.models.decoder import Qwen3Decoder

CFG = DecoderConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    num_kv_heads=2, head_dim=16, intermediate_size=128,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def decoder_and_params():
    decoder = Qwen3Decoder(CFG, dtype=jnp.float32, param_dtype=jnp.float32)
    embeds = jnp.zeros((1, 4, CFG.hidden_size))
    variables = decoder.init(jax.random.PRNGKey(0), embeds, jnp.zeros((1, 4), jnp.int32))
    return decoder, variables


def naive_greedy(decoder, variables, embeds, ids, gen):
    """Oracle: re-run the full forward for every generated token."""
    b = embeds.shape[0]
    out_tokens = np.full((b, gen.max_new_tokens), gen.pad_token_id, np.int32)
    finished = np.zeros(b, bool)
    cur_embeds = embeds
    seen = np.zeros((b, CFG.vocab_size), bool)
    for r in range(b):
        seen[r, np.asarray(ids)[r]] = True
    for step in range(gen.max_new_tokens):
        t = cur_embeds.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        logits, _ = decoder.apply(
            variables, cur_embeds, positions,
            padding_mask=jnp.ones((b, t), jnp.int32),
        )
        logits = np.asarray(logits[:, -1], np.float32)
        if gen.repetition_penalty != 1.0:
            pen = np.where(logits > 0, logits / gen.repetition_penalty,
                           logits * gen.repetition_penalty)
            logits = np.where(seen, pen, logits)
        tok = logits.argmax(-1).astype(np.int32)
        tok = np.where(finished, gen.pad_token_id, tok)
        out_tokens[:, step] = tok
        seen[np.arange(b), tok] = True
        finished |= np.isin(tok, gen.eos_token_ids)
        if finished.all():
            break
        tok_embeds = decoder.apply(variables, jnp.asarray(tok)[:, None],
                                   method=Qwen3Decoder.embed)
        cur_embeds = jnp.concatenate([cur_embeds, tok_embeds], axis=1)
    return out_tokens


def test_greedy_matches_naive_oracle(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    b, t = 2, 6
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, t)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(max_new_tokens=12, eos_token_ids=(257,), pad_token_id=0)

    tokens, lengths = generate_tokens(decoder, variables, embeds, ids, gen)
    ref = naive_greedy(decoder, variables, embeds, ids, gen)
    np.testing.assert_array_equal(np.asarray(tokens), ref)
    assert lengths.shape == (b,)


def test_repetition_penalty_matches_naive(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(
        max_new_tokens=10, eos_token_ids=(257,), pad_token_id=0,
        repetition_penalty=1.5,
    )
    tokens, _ = generate_tokens(decoder, variables, embeds, ids, gen)
    ref = naive_greedy(decoder, variables, embeds, ids, gen)
    np.testing.assert_array_equal(np.asarray(tokens), ref)

    # and the penalty must change the trajectory vs no penalty at this length
    gen_nopen = dataclasses.replace(gen, repetition_penalty=1.0)
    tokens_nopen, _ = generate_tokens(decoder, variables, embeds, ids, gen_nopen)
    assert not np.array_equal(np.asarray(tokens), np.asarray(tokens_nopen))


def test_streaming_matches_batch(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(max_new_tokens=8, eos_token_ids=(257,), pad_token_id=0)

    batch_tokens, batch_len = generate_tokens(decoder, variables, embeds, ids, gen)
    streamed = list(stream_generate(decoder, variables, embeds, ids, gen))
    expected = [int(t) for t in np.asarray(batch_tokens)[0] if t != 0][: len(streamed) + 1]
    # streaming stops *before* yielding EOS; batch records EOS in the buffer
    non_eos = [t for t in expected if t not in gen.eos_token_ids]
    assert streamed == non_eos


def test_min_new_tokens_blocks_eos(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 4)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    # pick the unconditional-first-token as "eos" so it would fire immediately
    gen0 = GenerationConfig(max_new_tokens=6, eos_token_ids=(), pad_token_id=0)
    first = int(np.asarray(generate_tokens(decoder, variables, embeds, ids, gen0)[0])[0, 0])

    gen = GenerationConfig(
        max_new_tokens=6, min_new_tokens=3, eos_token_ids=(first,), pad_token_id=0
    )
    tokens, _ = generate_tokens(decoder, variables, embeds, ids, gen)
    assert int(np.asarray(tokens)[0, 0]) != first  # eos suppressed at step 0


def test_sampling_reproducible(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 4)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(
        max_new_tokens=8, eos_token_ids=(), pad_token_id=0,
        do_sample=True, temperature=0.9, top_k=50, top_p=0.95,
    )
    key = jax.random.PRNGKey(42)
    a, _ = generate_tokens(decoder, variables, embeds, ids, gen, rng=key)
    b, _ = generate_tokens(decoder, variables, embeds, ids, gen, rng=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def naive_ngram_greedy(decoder, variables, embeds, ids, gen):
    """Independent HF-style oracle: dict of (n-1)-gram -> banned next tokens
    over the full sequence (prompt + generated), full forward each step."""
    n = gen.no_repeat_ngram_size
    b = embeds.shape[0]
    seqs = [list(map(int, np.asarray(ids)[r])) for r in range(b)]
    out_tokens = np.full((b, gen.max_new_tokens), gen.pad_token_id, np.int32)
    finished = np.zeros(b, bool)
    cur_embeds = embeds
    for step in range(gen.max_new_tokens):
        t = cur_embeds.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        logits, _ = decoder.apply(
            variables, cur_embeds, positions,
            padding_mask=jnp.ones((b, t), jnp.int32),
        )
        logits = np.array(logits[:, -1], np.float32)
        for r in range(b):
            banned = set()
            seq = seqs[r]
            ctx = tuple(seq[-(n - 1):]) if n > 1 else ()
            for i in range(len(seq) - n + 1):
                if tuple(seq[i:i + n - 1]) == ctx:
                    banned.add(seq[i + n - 1])
            for tok_id in banned:
                logits[r, tok_id] = np.finfo(np.float32).min
        tok = logits.argmax(-1).astype(np.int32)
        tok = np.where(finished, gen.pad_token_id, tok)
        out_tokens[:, step] = tok
        for r in range(b):
            seqs[r].append(int(tok[r]))
        finished |= np.isin(tok, gen.eos_token_ids)
        if finished.all():
            break
        tok_embeds = decoder.apply(variables, jnp.asarray(tok)[:, None],
                                   method=Qwen3Decoder.embed)
        cur_embeds = jnp.concatenate([cur_embeds, tok_embeds], axis=1)
    return out_tokens


def test_no_repeat_ngram_matches_naive(decoder_and_params, rng):
    """HF no_repeat_ngram_size semantics vs an independent dict-based oracle.

    A random-init model loops fast under plain greedy, so n-gram bans really
    fire here (verified: output differs from the unconstrained decode).
    """
    decoder, variables = decoder_and_params
    b, t = 2, 6
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, t)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(
        max_new_tokens=24, eos_token_ids=(), pad_token_id=0,
        no_repeat_ngram_size=2,
    )
    tokens, _ = generate_tokens(decoder, variables, embeds, ids, gen)
    ref = naive_ngram_greedy(decoder, variables, embeds, ids, gen)
    np.testing.assert_array_equal(np.asarray(tokens), ref)

    # the constraint must actually bite: no bigram repeats in the output
    for r in range(b):
        seq = list(np.asarray(ids)[r]) + list(ref[r])
        bigrams = list(zip(seq, seq[1:]))
        assert len(bigrams) == len(set(bigrams))

    plain = generate_tokens(
        decoder, variables, embeds, ids,
        dataclasses.replace(gen, no_repeat_ngram_size=0),
    )[0]
    assert not np.array_equal(np.asarray(plain), ref)


def test_no_repeat_ngram_trigram(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(
        max_new_tokens=32, eos_token_ids=(), pad_token_id=0,
        no_repeat_ngram_size=3,
    )
    tokens, _ = generate_tokens(decoder, variables, embeds, ids, gen)
    ref = naive_ngram_greedy(decoder, variables, embeds, ids, gen)
    np.testing.assert_array_equal(np.asarray(tokens), ref)


def test_no_repeat_ngram_streaming_matches_batch(decoder_and_params, rng):
    decoder, variables = decoder_and_params
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)), jnp.int32)
    embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
    gen = GenerationConfig(
        max_new_tokens=16, eos_token_ids=(), pad_token_id=0,
        no_repeat_ngram_size=2,
    )
    batch_tokens, _ = generate_tokens(decoder, variables, embeds, ids, gen)
    streamed = list(stream_generate(decoder, variables, embeds, ids, gen))
    np.testing.assert_array_equal(np.asarray(batch_tokens)[0], streamed)


def test_no_repeat_ngram_size_one_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        GenerationConfig(no_repeat_ngram_size=1)


class TestBucketedPrompt:
    """Right-padded prompts (prompt_len < T) must be token-exact vs the
    unpadded call: pad rows are causally invisible in prefill, their cache
    rows stay masked until the decode loop overwrites them, and the
    penalty/ngram bookkeeping is offset by prompt_len (the serving-side
    shape-bucketing contract — models/asr.py PROMPT_BUCKET)."""

    def _padded(self, decoder, variables, ids, pad_to, gen, rng_key=None):
        b, t = ids.shape
        ids_pad = jnp.concatenate(
            [ids, jnp.full((b, pad_to - t), gen.pad_token_id, jnp.int32)],
            axis=1,
        )
        embeds_pad = decoder.apply(variables, ids_pad,
                                   method=Qwen3Decoder.embed)
        return generate_tokens(
            decoder, variables, embeds_pad, ids_pad, gen, rng=rng_key,
            prompt_len=jnp.int32(t),
        )

    @pytest.mark.parametrize("gen_kwargs", [
        {},  # plain greedy
        {"repetition_penalty": 1.3},
        {"no_repeat_ngram_size": 2},
        {"repetition_penalty": 1.2, "no_repeat_ngram_size": 3,
         "min_new_tokens": 4},
    ])
    def test_padded_matches_exact(self, decoder_and_params, rng, gen_kwargs):
        decoder, variables = decoder_and_params
        b, t = 2, 7
        ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, t)),
                          jnp.int32)
        embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
        gen = GenerationConfig(max_new_tokens=12, eos_token_ids=(257,),
                               pad_token_id=0, **gen_kwargs)
        exact, exact_len = generate_tokens(decoder, variables, embeds, ids, gen)
        for pad_to in (8, 16, 33):
            padded, padded_len = self._padded(
                decoder, variables, ids, pad_to, gen
            )
            np.testing.assert_array_equal(np.asarray(exact),
                                          np.asarray(padded))
            np.testing.assert_array_equal(np.asarray(exact_len),
                                          np.asarray(padded_len))

    def test_padded_stream_matches_exact_batch(self, decoder_and_params, rng):
        decoder, variables = decoder_and_params
        ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)),
                          jnp.int32)
        embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
        gen = GenerationConfig(max_new_tokens=16, eos_token_ids=(),
                               pad_token_id=0, no_repeat_ngram_size=2)
        batch_tokens, _ = generate_tokens(decoder, variables, embeds, ids, gen)
        ids_pad = jnp.concatenate(
            [ids, jnp.full((1, 11), gen.pad_token_id, jnp.int32)], axis=1
        )
        embeds_pad = decoder.apply(variables, ids_pad,
                                   method=Qwen3Decoder.embed)
        streamed = list(stream_generate(
            decoder, variables, embeds_pad, ids_pad, gen, prompt_len=5
        ))
        np.testing.assert_array_equal(np.asarray(batch_tokens)[0], streamed)

    def test_model_generate_bucket_invariance(self, rng):
        """ASRModel.generate pads internally: forcing different bucket
        sizes must not change tokens (same real prompt, different pad)."""
        import tiny_audio_tpu.models.asr as asr_mod
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel

        from tiny_audio_tpu.pipeline import ASRPipeline

        model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        processor = ASRPipeline(model).processor
        audio = rng.standard_normal(8000).astype(np.float32) * 0.1
        feats = processor.extract_features([audio])
        args = (feats["input_features"], feats["audio_attention_mask"])
        out_64 = model.generate(*args)
        orig = asr_mod.PROMPT_BUCKET
        try:
            asr_mod.PROMPT_BUCKET = 128
            out_128 = model.generate(*args)
        finally:
            asr_mod.PROMPT_BUCKET = orig
        np.testing.assert_array_equal(out_64, out_128)


class TestReturnScores:
    """gen.return_scores: mean chosen-token log-prob under the RAW model
    distribution — oracle: teacher-force the emitted sequence through one
    full (cache-free) forward and recompute the per-step log-softmax."""

    def _expected(self, decoder, variables, prompt_embeds, tokens, lengths):
        t = prompt_embeds.shape[1]
        out = []
        for r in range(prompt_embeds.shape[0]):
            L = int(lengths[r])
            seq = np.asarray(tokens)[r, :L]
            parts = [prompt_embeds[r : r + 1]]
            if L > 1:
                parts.append(
                    decoder.apply(
                        variables, jnp.asarray(seq[None, :-1], jnp.int32),
                        method=Qwen3Decoder.embed,
                    )
                )
            emb = jnp.concatenate(parts, axis=1)
            n = emb.shape[1]
            logits, _ = decoder.apply(
                variables, emb, jnp.broadcast_to(jnp.arange(n), (1, n)),
                padding_mask=jnp.ones((1, n), jnp.int32),
            )
            logp = jax.nn.log_softmax(
                np.asarray(logits[0], np.float32), axis=-1
            )
            steps = [float(logp[t - 1 + j, seq[j]]) for j in range(L)]
            out.append(np.mean(steps))
        return np.asarray(out)

    def test_scores_match_teacher_forcing(self, decoder_and_params, rng):
        decoder, variables = decoder_and_params
        b, t = 2, 5
        ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, t)), jnp.int32)
        embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
        gen = GenerationConfig(
            max_new_tokens=10, eos_token_ids=(257,), pad_token_id=0
        )
        tokens, lengths = generate_tokens(decoder, variables, embeds, ids, gen)
        tokens_s, lengths_s, scores = generate_tokens(
            decoder, variables, embeds, ids,
            dataclasses.replace(gen, return_scores=True),
        )
        # the scored graph must not perturb the decode itself
        np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens_s))
        np.testing.assert_array_equal(np.asarray(lengths), np.asarray(lengths_s))
        expected = self._expected(decoder, variables, embeds, tokens_s, lengths_s)
        np.testing.assert_allclose(np.asarray(scores), expected, atol=5e-4)
        assert np.all(np.asarray(scores) <= 0.0)  # log-probs

    def test_scores_raw_even_under_penalty(self, decoder_and_params, rng):
        """Selection follows the penalized logits; the score stays the raw
        distribution's log-prob of whatever was chosen."""
        decoder, variables = decoder_and_params
        b, t = 2, 4
        ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, t)), jnp.int32)
        embeds = decoder.apply(variables, ids, method=Qwen3Decoder.embed)
        gen = GenerationConfig(
            max_new_tokens=8, eos_token_ids=(257,), pad_token_id=0,
            repetition_penalty=1.3, return_scores=True,
        )
        tokens, lengths, scores = generate_tokens(
            decoder, variables, embeds, ids, gen
        )
        expected = self._expected(decoder, variables, embeds, tokens, lengths)
        np.testing.assert_allclose(np.asarray(scores), expected, atol=5e-4)
