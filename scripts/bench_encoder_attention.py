"""Microbenchmark: encoder-attention kernel variants at the flagship shape.

VERDICT r3 next-round #5: the encoder is ~49% of e2e and its attention
kernel's stated floor is "d=64 dots (<=50% MXU lane use) + fp32 softmax,
both inherent".  This bench attacks the gap between the measured
~8 ms/layer-call at B32 and that ~5 ms floor:

- current      : shipped kernel (Python loop over heads; per-head d=64 dots,
                 fp32 jax.nn.softmax)
- bf16sm       : softmax exp in bf16 after an fp32 max-subtract (packed VPU
                 ops; scores are O(1) post-subtract so bf16 rounding is
                 ~1e-3 relative — measured against the shipped kernel below)
- rcp          : fp32 softmax but pl.reciprocal(approx=True) instead of the
                 divide (VPU transcendental cost)
- nomax        : drop the max-subtract entirely — scores are bounded by
                 the mask value and 1/sqrt(d) scaling in bf16-safe range
                 ONLY when inputs are normalized; numerically risky,
                 measured to size the max-pass cost, not to ship
- hg sweep     : heads-per-group {4, 10, 20} (VMEM-permitting)

A batched 3-D dot_general variant was tried and REJECTED by Mosaic:
reshape (BQ, hg*d) -> (BQ, hg, d) is an unsupported lane-splitting shape
cast inside a TPU kernel ("infer-vector-layout: unsupported shape cast").

Run on the real TPU:
    PYTHONPATH=/root/.axon_site:. python scripts/bench_encoder_attention.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiny_audio_tpu.models.layers import MASK_VALUE
from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

B, T, H, D = 32, 1536, 20, 64
BQ = 256
REPS = 30


def _softmax(s, mode):
    """s: fp32 [BQ, T] masked scores -> probabilities in bf16."""
    if mode == "fp32":
        return jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    if mode == "bf16":
        s = (s - jnp.max(s, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        p = jnp.exp(s)
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        return (p.astype(jnp.float32) / denom).astype(jnp.bfloat16)
    if mode == "rcp":
        from jax.experimental import pallas as pl

        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        inv = pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=True)
        return (p * inv).astype(jnp.bfloat16)
    if mode == "nomax":
        p = jnp.exp(s - 8.0)  # inputs ~N(0,1): scores bounded, no max pass
        denom = jnp.sum(p, axis=-1, keepdims=True)
        return (p / denom).astype(jnp.bfloat16)
    if mode == "shift":
        # constant-shift softmax: exp(min(s, 80) - 48) — pure elementwise
        # (no reduce, no [BQ,1] broadcast).  Exact softmax whenever the row
        # max is in [-39, 136]: min() kills overflow outright, and fp32
        # normals reach e^-87 so rows keep full relative precision until
        # their max drops below 48 - 87 = -39 (LayerNorm'd encoder scores
        # sit around +-30).  The +1e-30 denominator guard turns a fully
        # underflowed (or fully masked) row into zeros, not NaN.
        p = jnp.exp(jnp.minimum(s, 80.0) - 48.0)
        denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
        return (p / denom).astype(jnp.bfloat16)
    if mode == "tilemax":
        # ONE scalar max for the whole [BQ, T] tile instead of a per-row
        # reduce+broadcast: exp(s - m) stays exact softmax for any shared m;
        # fp32 exp absorbs ~80 nats of per-row spread below the tile max
        # before underflow, and the +1e-30 guard keeps fully-masked rows 0
        # instead of NaN.  Mask BEFORE the max so pad columns don't set m.
        m = jnp.max(jnp.max(s, axis=-1), axis=-1)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
        return (p / denom).astype(jnp.bfloat16)
    if mode == "tilemax_rcp":
        from jax.experimental import pallas as pl

        m = jnp.max(jnp.max(s, axis=-1), axis=-1)
        p = jnp.exp(s - m)
        inv = pl.reciprocal(
            jnp.sum(p, axis=-1, keepdims=True) + 1e-30, approx=True
        )
        return (p * inv).astype(jnp.bfloat16)
    raise ValueError(mode)


def _kernel_loop(q_ref, k_ref, v_ref, mask_ref, o_ref, *, hg, d, sm):
    mask = mask_ref[0] > 0
    for h in range(hg):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (d ** -0.5)
        s = jnp.where(mask, s, MASK_VALUE)
        if sm in ("qnorm", "qnorm_post", "fp32_post", "shift_post",
                  "tilemax_post"):
            if sm == "fp32_post":
                m = jnp.max(s, axis=-1, keepdims=True)
            elif sm == "shift_post":
                m = 48.0
                s = jnp.minimum(s, 80.0)
            elif sm == "tilemax_post":
                # ONE scalar max over the whole [BQ, T] tile: exact softmax
                # for ANY input (shared shift cancels), no per-row broadcast.
                # fp32 exp absorbs ~87 nats of per-row spread below the tile
                # max before underflow.  Mask applied before the max: with
                # any real column, m is a real score and pad columns
                # underflow to 0; a fully-masked tile gives m = MASK_VALUE
                # -> uniform weights, same as the shipped jax.nn.softmax.
                m = jnp.max(s)
            else:
                # Cauchy-Schwarz upper bound on each row's max score:
                # |q_row| * max_t |k_t| / sqrt(d).  Reduces over d=64
                # instead of T=1536 (24x fewer elements than the max pass);
                # exp never overflows (bound >= true max) and fp32 absorbs
                # the bound's slack (typically < 30 nats) before underflow.
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
                kmax = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=-1)))
                m = qn * (kmax * (d ** -0.5))
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
            if sm == "qnorm":
                p = (p / denom).astype(jnp.bfloat16)
                o = jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                # fold the divide into the [BQ, d] output (24x fewer
                # elements than dividing the [BQ, T] probability tile)
                o = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / denom
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
            continue
        p = _softmax(s, sm)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _kernel_packed2(q_ref, k_ref, v_ref, mask_ref, o_ref, *, hg, d):
    """Two d=64 heads per 128-lane dot (VERDICT r4 #2, the r3 suggestion).

    Packing is block-diagonal: K2 [2T, 128] holds k1 in (rows 0:T, lanes
    0:64) and k2 in (rows T:2T, lanes 64:128), so [q1|q2] @ K2^T yields
    [s1 | s2] in ONE K=128 dot; symmetrically [p1|p2] @ V2 yields
    [o1 | o2] in one N=128 dot.  NOTE the MXU pass-count is unchanged —
    K=64 pads to 128 rows anyway, and the packed dot doubles N — so any
    win must come from halving the number of issued dots / larger tiles;
    the zeros cost VPU concat work.  Measured to settle it either way."""
    mask = mask_ref[0] > 0  # [1, T]
    t = k_ref.shape[1]
    mask2 = jnp.concatenate([mask, mask], axis=-1)  # [1, 2T]
    for hp in range(hg // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
        qp = q_ref[0, :, sl]  # [BQ, 2d] = [q1 | q2]
        kp = k_ref[0, :, sl]
        vp = v_ref[0, :, sl]
        zeros = jnp.zeros((t, d), kp.dtype)
        k2 = jnp.concatenate([
            jnp.concatenate([kp[:, :d], zeros], axis=1),
            jnp.concatenate([zeros, kp[:, d:]], axis=1),
        ], axis=0)  # [2T, 2d] block-diagonal
        v2 = jnp.concatenate([
            jnp.concatenate([vp[:, :d], zeros], axis=1),
            jnp.concatenate([zeros, vp[:, d:]], axis=1),
        ], axis=0)
        s = jax.lax.dot_general(
            qp, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (d ** -0.5)
        s = jnp.where(mask2, s, MASK_VALUE)  # [BQ, 2T] = [s1 | s2]
        p = jnp.exp(jnp.minimum(s, 80.0) - 48.0)
        d1 = jnp.sum(p[:, :t], axis=-1, keepdims=True) + 1e-30
        d2 = jnp.sum(p[:, t:], axis=-1, keepdims=True) + 1e-30
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, 2d] = [o1*Z1 | o2*Z2]
        o = jnp.concatenate([o[:, :d] / d1, o[:, d:] / d2], axis=1)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def build(hg, sm):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hd = hg * D

    kernel = (
        functools.partial(_kernel_packed2, hg=hg, d=D)
        if sm == "packed2"
        else functools.partial(_kernel_loop, hg=hg, d=D, sm=sm)
    )

    @jax.jit
    def run(q, k, v, mask3):
        return pl.pallas_call(
            kernel,
            grid=(B, H // hg, T // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, hd), lambda b, g, i: (b, i, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, hd), lambda b, g, i: (b, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, hd), lambda b, g, i: (b, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T), lambda b, g, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BQ, hd), lambda b, g, i: (b, i, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
        )(q, k, v, mask3)

    return run


def time_variant(name, run, q, k, v, mask3):
    # LICM-proof fused loop: each iteration's input depends on the last output
    @jax.jit
    def loop(q0):
        def body(i, acc):
            return run(q0 + acc[0, 0, 0].astype(q0.dtype) * 1e-12, k, v, mask3)
        return jax.lax.fori_loop(0, REPS, body, q0)

    try:
        out = loop(q)
        block_until_ready_via_host(out)
        t0 = time.perf_counter()
        out = loop(q)
        block_until_ready_via_host(out)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:28s} {ms:7.3f} ms/layer-call", flush=True)
        return ms
    except Exception as e:  # keep later variants running
        print(f"{name:28s} FAILED: {str(e).splitlines()[0][:100]}", flush=True)
        return float("inf")


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.bfloat16)
    lengths = rng.integers(T // 2, T, B)
    mask = (np.arange(T)[None] < lengths[:, None]).astype(np.int32)
    mask3 = jnp.asarray(mask[:, None, :])

    print(f"shape B={B} T={T} H={H} D={D}, bf16, {REPS}-rep fused loop",
          flush=True)

    results = {}
    # hg=20 exceeds the VMEM budget (remote compile 500s); hg 4/10 measured
    for hg in (10,):
        results[f"loop-fp32(hg={hg})"] = time_variant(
            f"loop-fp32(hg={hg})", build(hg, "fp32"), q, k, v, mask3)
    for sm in ("nomax", "shift", "shift_post", "fp32_post", "tilemax_post",
               "packed2"):
        results[f"loop-{sm}(hg=10)"] = time_variant(
            f"loop-{sm}(hg=10)", build(10, sm), q, k, v, mask3)

    # numerical error vs a float64 CPU oracle (the honest tiebreak: errors
    # vs the shipped kernel conflate candidate error with the shipped
    # kernel's own bf16 rounding).  Oracle on a 4-batch slice to bound RAM.
    from tiny_audio_tpu.ops.encoder_attention import encoder_attention_tpu

    nb = 4
    qs, ks, vs = (np.asarray(x[:nb], np.float64) for x in (q, k, v))
    sc = np.einsum("btd,bsd->bts", qs.reshape(nb, T, H, D).transpose(0, 2, 1, 3).reshape(nb * H, T, D),
                   ks.reshape(nb, T, H, D).transpose(0, 2, 1, 3).reshape(nb * H, T, D)) * (D ** -0.5)
    mrep = np.repeat(mask[:nb], H, 0)[:, None, :].astype(bool)
    sc = np.where(mrep, sc, -1e30)
    sc -= sc.max(-1, keepdims=True)
    p64 = np.exp(sc)
    p64 /= p64.sum(-1, keepdims=True)
    o64 = np.einsum("bts,bsd->btd",
                    p64, vs.reshape(nb, T, H, D).transpose(0, 2, 1, 3).reshape(nb * H, T, D))
    oracle = o64.reshape(nb, H, T, D).transpose(0, 2, 1, 3).reshape(nb, T, H * D)
    real = mask[:nb, :, None].astype(bool)

    def oracle_err(out):
        return float(np.abs(np.where(real, np.asarray(out[:nb], np.float64) - oracle, 0.0)).max())

    shipped = encoder_attention_tpu(q, k, v, jnp.asarray(mask), num_heads=H)
    print(f"max|shipped - fp64 oracle|        = {oracle_err(shipped):.2e}", flush=True)
    for sm in ("shift", "shift_post", "fp32_post", "tilemax_post", "packed2"):
        try:
            out = build(10, sm)(q, k, v, mask3)
            print(f"max|loop-{sm} - fp64 oracle| = {oracle_err(out):.2e}",
                  flush=True)
        except Exception as e:
            print(f"parity {sm} FAILED: {str(e).splitlines()[0][:80]}",
                  flush=True)
    best = min(results, key=results.get)
    print(f"fastest: {best} at {results[best]:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
