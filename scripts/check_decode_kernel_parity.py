import os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from tiny_audio_tpu.config import DecoderConfig
from tiny_audio_tpu.generation import GenerationConfig, generate_tokens
from tiny_audio_tpu.models.decoder import Qwen3Decoder

cfg = DecoderConfig(vocab_size=512, hidden_size=256, num_layers=4, num_heads=4,
                    num_kv_heads=2, head_dim=128, intermediate_size=512,
                    max_position_embeddings=2048,
                    kv_cache_dtype=os.environ.get("KVD", "bfloat16"))
dec = Qwen3Decoder(cfg, dtype=jnp.bfloat16, param_dtype=jnp.float32)
ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (2, 300)), jnp.int32)
variables = dec.init(jax.random.PRNGKey(0), dec.apply, method=None) if False else dec.init(
    jax.random.PRNGKey(0), jnp.zeros((2, 4, 256), jnp.bfloat16), jnp.zeros((2, 4), jnp.int32))
embeds = dec.apply(variables, ids, method=Qwen3Decoder.embed)
gen = GenerationConfig(max_new_tokens=64, eos_token_ids=(), pad_token_id=0)

toks_kernel, _ = generate_tokens(dec, variables, embeds, ids, gen)
toks_kernel = np.asarray(toks_kernel)
os.environ["TA_FORCE_XLA_DECODE"] = "1"
toks_xla, _ = generate_tokens(dec, variables, embeds, ids, gen)
toks_xla = np.asarray(toks_xla)
same = (toks_kernel == toks_xla).mean()
print("match fraction:", same)
print("kernel:", toks_kernel[0, :12])
print("xla:   ", toks_xla[0, :12])
assert same == 1.0, "token mismatch"
print("PARITY OK", cfg.kv_cache_dtype)
