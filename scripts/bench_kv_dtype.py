"""KV-cache dtype read-rate shootout: bf16 vs int8 vs int4 (real TPU).

Decode attention reads the FULL static-S cache every step (the XLA masked
matvec path, ops/attention.decode_step_attention) — at the serving shape
(b48, S=640, 28 layers, Hkv=8 x D=128) that is ~1.65 GB/step of int8 cache,
roughly a third of the per-step HBM traffic.  int8 already halved it vs
bf16 (+10% e2e RTFx); this measures whether XLA reads a *packed int4* cache
at ~2x the int8 byte rate on this chip — the one untried decode bandwidth
lever.  (int4 per-entry quantization is ~8x the int8 RMS error, so shipping
it would be a measured opt-in like int8 was; this bench only answers the
bandwidth question.)

Method mirrors scripts/bench_wq_kernel.py: one jitted 28-layer lax.scan per
step, ITERS dependency-chained steps per timed call, median of 5.

Run: python scripts/bench_kv_dtype.py   (axon/TPU env)
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tiny_audio_tpu.ops.attention import decode_step_attention
from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

B, S, L, HKV, HQ, D = 48, 640, 28, 8, 16, 128
ITERS = 20
KV_LEN = 512  # valid prefix (the prompt bucket); masked path reads full S


def quantize(x, dtype):
    """Per-entry symmetric quantization over D (decoder.quantize_kv shape
    conventions), to int8 (qmax 127) or int4 (qmax 7)."""
    qmax = 127.0 if dtype == jnp.int8 else 7.0
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -qmax, qmax).astype(dtype)
    return q, scale


def step_fn(q, cache_k, cache_v, fresh_k, fresh_v, k_scale, v_scale, valid):
    """One 28-layer decode-attention pass; folds output back into q so
    chained iterations stay dependency-ordered."""
    quantized = k_scale is not None

    def layer(qc, layer_cache):
        if quantized:
            ck, cv, ks, vs = layer_cache
        else:
            ck, cv = layer_cache
            ks = vs = None
        out = decode_step_attention(
            qc, ck, cv, valid, fresh_k=fresh_k, fresh_v=fresh_v,
            k_scale=ks, v_scale=vs,
        )
        return (qc + out.astype(qc.dtype) * 1e-3).astype(qc.dtype), None

    xs = ((cache_k, cache_v, k_scale, v_scale) if quantized
          else (cache_k, cache_v))
    q, _ = jax.lax.scan(layer, q, xs)
    return q


def run(dtype_name: str):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)), jnp.bfloat16)
    fresh = jnp.asarray(rng.standard_normal((B, 1, HKV, D)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((L, B, S, HKV, D)), jnp.float32)
    valid = (jnp.arange(S) < KV_LEN).astype(jnp.int32)

    if dtype_name == "bf16":
        cache_k = cache_v = kv.astype(jnp.bfloat16)
        bytes_per_entry = 2.0

        def mk_args():
            return (q, cache_k, cache_v, fresh, fresh, None, None, valid)
    else:
        dt = jnp.int8 if dtype_name == "int8" else jnp.int4
        ck, ks = quantize(kv, dt)
        cv, vs = quantize(kv * 0.7, dt)
        bytes_per_entry = 1.0 if dtype_name == "int8" else 0.5
        def mk_args():
            return (q, ck, cv, fresh, fresh, ks, vs, valid)

    def chained(q0, *rest):
        def body(_, qc):
            return step_fn(qc, *rest)
        return jax.lax.fori_loop(0, ITERS, body, q0)

    f = jax.jit(chained)
    args = mk_args()
    out = f(*args)
    block_until_ready_via_host(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        block_until_ready_via_host(out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / ITERS * 1e3
    cache_gb = 2 * L * B * S * HKV * D * bytes_per_entry / 1e9
    scale_gb = 0.0 if dtype_name == "bf16" else 2 * L * B * S * HKV * 4 / 1e9
    print(
        f"{dtype_name:5s}: {ms:7.3f} ms/step   cache {cache_gb:.2f} GB "
        f"+ scales {scale_gb:.2f} GB -> {(cache_gb + scale_gb) / (ms / 1e3):.0f} GB/s eff",
        flush=True,
    )
    return ms


def main():
    enable_persistent_compile_cache()
    print(f"decode-attn read shootout: B={B} S={S} L={L} Hkv={HKV} D={D} "
          f"iters={ITERS}", flush=True)
    for name in ("bf16", "int8", "int4"):
        try:
            run(name)
        except Exception as e:  # int4 may be unsupported by this lowering
            print(f"{name:5s}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)


if __name__ == "__main__":
    main()
