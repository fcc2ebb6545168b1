"""LM-head int8 kernel shootout at the decode shape (VERDICT r4 #6).

The round-4 measurement isolated the wq kernel's defect on the one shape
where int8 halving matters — the 151k-vocab LM head (K=1024, N=151936,
~311 MB bf16 / ~155 MB int8 per step): the per-tile int8->bf16 VPU convert
runs at ~117 GB/s effective vs XLA's 449 GB/s bf16 dot.  Two candidate
fixes, both measured here against the bf16 dot and the shipped grid
kernel:

- ``pipe``: one Mosaic-pipelined program per NC-wide output chunk; inside,
  a manual double-buffered DMA loop (pltpu.make_async_copy from HBM)
  overlaps the next int8 sub-tile's fetch with the current tile's
  convert+dot.  If the convert itself (not the DMA) is the wall, this
  caps out at the convert rate and settles the parking verdict.
- ``a8``: skip the convert entirely — quantize the activation per-row to
  int8 (dynamic, outside the kernel) and issue a NATIVE int8 x int8 ->
  int32 MXU dot straight off the int8 weight tile, then fold the two
  scales into the f32 epilogue.  v5e's MXU has 2x int8 throughput and the
  weight read is the true 155 MB floor.  Numerics are W8A8 (not
  weight-only): the bench prints logit error and greedy-argmax agreement
  vs the bf16 dot on matched inputs.

Run on the real TPU:  python scripts/bench_wq_head.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiny_audio_tpu.ops.wq_matmul import quantize_weight, wq_matmul
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

B, K, N = 48, 1024, 151936
REPS = 50


# ---------------------------------------------------------------- pipe ---
def _pipe_kernel(x_ref, s_ref, w_hbm, o_ref, *, nc: int, nt: int, k: int):
    """One program per NC output chunk; double-buffered int8 sub-tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = pl.program_id(0)
    x = x_ref[...]  # [B, K] bf16, resident
    n_sub = nc // nt

    def body(scratch, sem):
        def get_dma(slot, j):
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(c * nc + j * nt, nt)],
                scratch.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()

        def loop(j, _):
            slot = j % 2

            @pl.when(j + 1 < n_sub)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            w = scratch[slot].astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sc = s_ref[0, pl.ds(j * nt, nt)].astype(jnp.float32)
            o_ref[:, pl.ds(j * nt, nt)] = (acc * sc[None, :]).astype(
                jnp.bfloat16
            )
            return 0

        jax.lax.fori_loop(0, n_sub, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, k, nt), jnp.int8),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def build_pipe(nc: int, nt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x, w_i8, scale):
        b, k = x.shape
        n = w_i8.shape[1]
        s2 = scale.reshape(1, n)
        return pl.pallas_call(
            functools.partial(_pipe_kernel, nc=nc, nt=nt, k=k),
            grid=(n // nc,),
            in_specs=[
                pl.BlockSpec((b, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nc), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # w_i8 stays in HBM
            ],
            out_specs=pl.BlockSpec((b, nc), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        )(x, s2, w_i8)

    return run


# ------------------------------------------------------------------ a8 ---
def quantize_act(x):
    """Per-row symmetric int8: x [B, K] -> (x_i8, sx [B, 1] f32)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = jnp.maximum(ax, 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(
        jnp.int8
    )
    return x_i8, sx


def _a8_kernel(x_ref, s_ref, sx_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx_ref[...] * s_ref[...]
    o_ref[...] = out.astype(jnp.bfloat16)


def build_a8(nt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x, w_i8, scale):
        b, k = x.shape
        n = w_i8.shape[1]
        x_i8, sx = quantize_act(x)
        s2 = scale.reshape(1, n)
        return pl.pallas_call(
            _a8_kernel,
            grid=(pl.cdiv(n, nt),),
            in_specs=[
                pl.BlockSpec((b, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, nt), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, nt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        )(x_i8, s2, sx, w_i8)

    return run


# ------------------------------------------------------------- a8 [N,K] ---
def _a8t_kernel(x_ref, s_ref, sx_ref, wt_ref, o_ref):
    # wt tile is [NT, K]: contract x's dim 1 with wt's dim 1.
    acc = jax.lax.dot_general(
        x_ref[...], wt_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx_ref[...] * s_ref[...]
    o_ref[...] = out.astype(jnp.bfloat16)


def build_a8t(nt: int):
    """a8 with the weight stored transposed [N, K]: each (nt, K) tile is one
    fully contiguous HBM block (nt*K bytes) instead of K strided runs of nt
    bytes, so the automatic Mosaic pipeline's DMAs are long-burst reads."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def run(x, wt_i8, scale):
        b, k = x.shape
        n = wt_i8.shape[0]
        x_i8, sx = quantize_act(x)
        s2 = scale.reshape(1, n)
        return pl.pallas_call(
            _a8t_kernel,
            grid=(pl.cdiv(n, nt),),
            in_specs=[
                pl.BlockSpec((b, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nt, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, nt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.bfloat16),
        )(x_i8, s2, sx, wt_i8)

    return run


# --------------------------------------------------------------- timing ---
def time_variant(name, run, *args):
    # weights must be jit ARGUMENTS, not closure constants: a closed-over
    # 311 MB bf16 weight gets serialized into the remote-compile request
    # and the tunnel rejects it with HTTP 413.
    @jax.jit
    def loop(x0, *rest):
        # dependency-chained loop without keeping the full [B, N] alive
        def body(i, carry):
            xi = x0 * (1.0 + carry * 1e-12).astype(x0.dtype)
            out = run(xi, *rest)
            return out[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    try:
        r = loop(*args)
        block_until_ready_via_host(r)
        t0 = time.perf_counter()
        r = loop(*args)
        block_until_ready_via_host(r)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        int8_gbs = (K * N) / (ms * 1e-3) / 1e9
        print(f"{name:26s} {ms:7.3f} ms   ({int8_gbs:6.1f} GB/s int8-bytes)",
              flush=True)
        return ms
    except Exception as e:
        print(f"{name:26s} FAILED: {str(e).splitlines()[0][:110]}", flush=True)
        return float("inf")


def main():
    rng = np.random.default_rng(0)
    # activation statistics matter for a8 numerics: use a realistic
    # RMSNorm'd-hidden-state scale (unit RMS x learned gain ~O(1-10))
    x = jnp.asarray(rng.standard_normal((B, K)) * 2.0, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    w_i8, scale = quantize_weight(w)
    w_i8 = jax.device_put(w_i8)

    @jax.jit
    def bf16_dot(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    print(f"LM-head shape B={B} K={K} N={N}, {REPS}-rep chained loop",
          flush=True)
    t_bf16 = time_variant("bf16 dot", bf16_dot, x, w)
    t_ship = time_variant("wq shipped (grid NT=512)",
                          lambda x, w, s: wq_matmul(x, w, s), x, w_i8, scale)
    results = {"bf16": t_bf16, "shipped": t_ship}
    for nc, nt in ((8192, 1024), (8192, 2048), (16384, 2048), (16384, 4096)):
        results[f"pipe nc={nc} nt={nt}"] = time_variant(
            f"pipe nc={nc} nt={nt}", build_pipe(nc, nt), x, w_i8, scale)
    for nt in (2048, 4096, 8192):
        results[f"a8 nt={nt}"] = time_variant(
            f"a8 nt={nt}", build_a8(nt), x, w_i8, scale)
    wt_i8 = jax.device_put(jnp.asarray(np.asarray(w_i8).T))
    for nt in (2048, 4096, 8192):
        results[f"a8t nt={nt}"] = time_variant(
            f"a8t nt={nt}", build_a8t(nt), x, wt_i8, scale)

    # ---- numerics: logits error + greedy-argmax agreement vs bf16 ----
    ref = np.asarray(bf16_dot(x, w), np.float32)

    def report(name, out):
        got = np.asarray(out, np.float32)
        rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) or 1.0)
        agree = float(np.mean(got.argmax(1) == ref.argmax(1)))
        print(f"{name:26s} rel_err={rel:.4f}  argmax-agree={agree:.3f}",
              flush=True)

    try:
        report("wq shipped", wq_matmul(x, w_i8, scale))
    except Exception as e:
        print(f"wq shipped numerics FAILED: {e}", flush=True)
    for nc, nt in ((8192, 2048),):
        try:
            report(f"pipe nc={nc} nt={nt}", build_pipe(nc, nt)(x, w_i8, scale))
        except Exception as e:
            print(f"pipe numerics FAILED: {str(e).splitlines()[0][:80]}",
                  flush=True)
    try:
        report("a8 nt=2048", build_a8(2048)(x, w_i8, scale))
    except Exception as e:
        print(f"a8 numerics FAILED: {str(e).splitlines()[0][:80]}", flush=True)

    best = min(results, key=results.get)
    print(f"fastest: {best} at {results[best]:.3f} ms "
          f"(bf16 baseline {t_bf16:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
