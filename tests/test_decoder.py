"""Decoder parity vs HF Qwen3 (random-init oracle) + KV-cache consistency.

Oracle pattern (SURVEY.md §4): a tiny ``Qwen3ForCausalLM`` with random weights
is converted through ``convert_hf_qwen3``; logits must match, which pins down
the architecture (GQA, QK-norm, RoPE layout, SwiGLU) and the converter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiny_audio_tpu.config import DecoderConfig
from tiny_audio_tpu.models.decoder import Qwen3Decoder, convert_hf_qwen3

CFG = DecoderConfig(
    vocab_size=512,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    rope_theta=1_000_000.0,
    tie_word_embeddings=True,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    config = Qwen3Config(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        head_dim=CFG.head_dim,
        intermediate_size=CFG.intermediate_size,
        rope_theta=CFG.rope_theta,
        tie_word_embeddings=True,
        max_position_embeddings=CFG.max_position_embeddings,
        attn_implementation="eager",
    )
    model = Qwen3ForCausalLM(config)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    return {"params": convert_hf_qwen3(hf_model.state_dict(), CFG, dtype=jnp.float32)}


@pytest.fixture(scope="module")
def decoder():
    return Qwen3Decoder(CFG, dtype=jnp.float32, param_dtype=jnp.float32)


def test_logits_match_hf(hf_model, jax_params, decoder, rng):
    import torch

    ids = rng.integers(0, CFG.vocab_size, size=(2, 11))
    with torch.no_grad():
        ref = hf_model(input_ids=torch.tensor(ids)).logits.numpy()

    embeds = decoder.apply(jax_params, jnp.asarray(ids), method=Qwen3Decoder.embed)
    positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    logits, _ = decoder.apply(
        jax_params, embeds, positions, padding_mask=jnp.ones_like(jnp.asarray(ids))
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


def test_padding_mask_matches_hf(hf_model, jax_params, decoder, rng):
    import torch

    ids = rng.integers(0, CFG.vocab_size, size=(2, 9))
    attn = np.ones((2, 9), dtype=np.int64)
    attn[1, 6:] = 0  # right padding on row 1
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn)
        ).logits.numpy()

    embeds = decoder.apply(jax_params, jnp.asarray(ids), method=Qwen3Decoder.embed)
    positions = jnp.broadcast_to(jnp.arange(9), ids.shape)
    logits, _ = decoder.apply(
        jax_params, embeds, positions, padding_mask=jnp.asarray(attn)
    )
    # compare only real positions
    np.testing.assert_allclose(
        np.asarray(logits)[attn.astype(bool)], ref[attn.astype(bool)],
        atol=2e-4, rtol=2e-3,
    )


def test_kv_cache_decode_matches_full_forward(jax_params, decoder, rng):
    """Prefill + single-token decode steps == one full forward (greedy path)."""
    b, t_prompt, t_total, max_len = 2, 5, 9, 16
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, t_total)))

    embeds = decoder.apply(jax_params, ids, method=Qwen3Decoder.embed)
    positions = jnp.broadcast_to(jnp.arange(t_total), (b, t_total))
    full_logits, _ = decoder.apply(
        jax_params, embeds, positions,
        padding_mask=jnp.ones((b, t_total), jnp.int32),
    )

    # Prefill on the prompt
    cache = decoder.init_cache(b, max_len, dtype=jnp.float32)
    logits_p, cache = decoder.apply(
        jax_params, embeds[:, :t_prompt], positions[:, :t_prompt],
        padding_mask=jnp.ones((b, t_prompt), jnp.int32), cache=cache, cache_index=0,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :t_prompt]), atol=1e-4, rtol=1e-3
    )

    # Step-by-step decode for the remaining tokens.  kv_valid marks CACHED
    # positions (< step): the fresh position is appended in-kernel
    # (ops/attention.decode_step_attention), which is what lets the decoder
    # write the cache once per step outside the layer scan.
    for step in range(t_prompt, t_total):
        kv_valid = (jnp.arange(max_len) < step)[None, :].astype(jnp.int32)
        logits_s, cache = decoder.apply(
            jax_params, embeds[:, step : step + 1], positions[:, step : step + 1],
            step_kv_valid=kv_valid, cache=cache, cache_index=step,
        )
        np.testing.assert_allclose(
            np.asarray(logits_s[:, 0]), np.asarray(full_logits[:, step]),
            atol=1e-4, rtol=1e-3,
        )


def test_decoder_jit_and_determinism(jax_params, decoder, rng):
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 7)))
    embeds = decoder.apply(jax_params, ids, method=Qwen3Decoder.embed)
    positions = jnp.arange(7)[None, :]

    @jax.jit
    def run(e):
        out, _ = decoder.apply(
            jax_params, e, positions, padding_mask=jnp.ones((1, 7), jnp.int32)
        )
        return out

    a, b_ = run(embeds), run(embeds)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
