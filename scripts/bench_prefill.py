"""Microbenchmark: LM prefill at the serving shape.

docs/performance.md pegs prefill at ~360 ms for B=32 x ~470 tokens — but the
arithmetic is ~13 TFLOP, i.e. ~35 ms at the MXU peak.  An 8x gap means
either the table entry folded other work in, or the prefill graph is far
off roofline.  This bench isolates ONE decoder.apply prefill call
(flagship Qwen3-0.6B shape, bf16, int8 KV cache as served) and sweeps
batch/length, printing achieved TFLOP/s.

Run: PYTHONPATH=/root/.axon_site:. python scripts/bench_prefill.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.config import ASRConfig
from tiny_audio_tpu.models.decoder import Qwen3Decoder
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

REPS = 10


def matmul_flops(cfg, b, t) -> float:
    """2 * MACs for the per-token linear layers + last-token lm_head."""
    h = cfg.hidden_size
    q = cfg.num_heads * cfg.head_dim
    kv = cfg.num_kv_heads * cfg.head_dim
    per_layer = h * q + 2 * h * kv + q * h + 3 * h * cfg.intermediate_size
    attn = 0
    # causal attention scores+values: ~t^2/2 * (q + q) per layer
    attn = cfg.num_layers * (t * t) * cfg.num_heads * cfg.head_dim * 2
    head = h * cfg.vocab_size  # last token only
    return 2.0 * b * (t * cfg.num_layers * per_layer + head) + b * attn


def main():
    cfg = ASRConfig()
    cfg.kv_cache_dtype = "int8"
    dec_cfg = cfg.decoder
    dec = Qwen3Decoder(dec_cfg, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    b0, t0 = 1, 16
    dummy_embeds = jnp.zeros((b0, t0, dec_cfg.hidden_size), jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(t0), (b0, t0))
    cache0 = dec.init_cache(b0, 32)
    variables = dec.init(
        rng, dummy_embeds, positions,
        padding_mask=jnp.ones((b0, t0), jnp.int32),
        cache=cache0, cache_index=0,
        last_logit_index=jnp.int32(t0 - 1),
    )
    print("params initialized", flush=True)

    @jax.jit
    def prefill(variables, embeds, cache, prompt_len):
        b, t, _ = embeds.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        logits, cache = dec.apply(
            variables, embeds, positions,
            padding_mask=jnp.ones((b, t), jnp.int32),
            cache=cache, cache_index=0, last_logit_index=prompt_len - 1,
        )
        return logits, cache

    for b, t in ((32, 512), (48, 512), (32, 256), (8, 512)):
        s = -(-(t + 128) // 16) * 16
        embeds = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, t, dec_cfg.hidden_size)),
            jnp.bfloat16,
        )
        cache = dec.init_cache(b, s)
        prompt_len = jnp.int32(t)
        out = prefill(variables, embeds, cache, prompt_len)
        block_until_ready_via_host(out[0])
        t0_ = time.perf_counter()
        for _ in range(REPS):
            out = prefill(variables, embeds, cache, prompt_len)
        block_until_ready_via_host(out[0])
        ms = (time.perf_counter() - t0_) / REPS * 1e3
        fl = matmul_flops(dec_cfg, b, t)
        print(
            f"prefill b={b:3d} t={t:4d}: {ms:8.2f} ms  "
            f"{fl / (ms / 1e3) / 1e12:6.1f} TFLOP/s "
            f"({fl / 1e12:.2f} TFLOP)",
            flush=True,
        )


if __name__ == "__main__":
    main()
