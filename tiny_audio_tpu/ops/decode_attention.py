"""Fused decode-step attention as a Pallas TPU kernel.

Replaces the XLA masked-matvec decode attention
(:func:`tiny_audio_tpu.ops.attention.decode_step_attention`, the round-1
path) for the KV-cached decode hot loop.  What the kernel buys over XLA:

- **Length-aware cache reads.** The cache is a static [B, S, Hkv*D] ring but
  only ``kv_len`` positions are valid; XLA reads all S rows every step and
  masks.  Here the valid prefix length is scalar-prefetched and the kernel
  DMAs only ``ceil(kv_len / BLOCK)`` slabs from HBM — decode is
  bandwidth-bound, so skipped bytes are time saved (prompt ~375 of S~503 at
  step 0 -> ~25% less KV traffic early, ~12% averaged over a 128-token
  decode).
- **Native int8 cache reads.** With ``kv_cache_dtype="int8"`` the slabs move
  HBM->VMEM as int8 (half traffic) and dequantize in VMEM; the scale folding
  matches the XLA path (scores * k_scale, probs * v_scale).
- **One fused pass**: QK, valid-prefix masking, the stale-cache + fresh-self
  softmax (the single-cache-write decode contract, models/decoder.py:57),
  and PV run per (batch) program with zero intermediate HBM traffic.

Numerical contract: identical to ``decode_step_attention`` with a
prefix-valid mask (tests/test_decode_attention.py compares both, and the
greedy-tokens-unchanged test pins end-to-end equivalence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiny_audio_tpu.models.layers import MASK_VALUE

BLOCK = 256  # cache rows per DMA slab


def _kernel(
    len_ref,      # SMEM scalar-prefetch: [1] int32 valid cache length
    q_ref,        # VMEM [1, Hq, D]
    k_hbm,        # ANY  [B, S, Hkv*D] (bf16 or int8)
    v_hbm,        # ANY  [B, S, Hkv*D]
    fresh_k_ref,  # VMEM [1, Hkv, D]
    fresh_v_ref,  # VMEM [1, Hkv, D]
    k_scale_ref,  # VMEM [1, S, Hkv] fp32 (dummy [1, 1, Hkv] when bf16)
    v_scale_ref,  # VMEM
    o_ref,        # VMEM [1, Hq, D]
    k_buf,        # VMEM scratch (S, Hkv*D) cache dtype
    v_buf,
    sems,         # DMA sems (n_blocks, 2)
    *,
    hkv: int,
    group: int,
    d: int,
    s: int,
    quantized: bool,
):
    b = pl.program_id(0)
    kv_len = len_ref[0]
    n_blocks = pl.cdiv(s, BLOCK)

    def copies(i, size):
        c = [
            pltpu.make_async_copy(
                k_hbm.at[b, pl.ds(i * BLOCK, size)],
                k_buf.at[pl.ds(i * BLOCK, size)], sems.at[i, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, pl.ds(i * BLOCK, size)],
                v_buf.at[pl.ds(i * BLOCK, size)], sems.at[i, 1],
            ),
        ]
        return c

    # issue DMAs for valid slabs; zero-fill the rest (garbage VMEM would
    # poison PV through 0 * NaN even under the score mask)
    for i in range(pl.cdiv(s, BLOCK)):
        size = min(BLOCK, s - i * BLOCK)

        @pl.when(i * BLOCK < kv_len)
        def _(i=i, size=size):
            for c in copies(i, size):
                c.start()

        @pl.when(i * BLOCK >= kv_len)
        def _(i=i, size=size):
            k_buf[pl.ds(i * BLOCK, size)] = jnp.zeros(
                (size, hkv * d), k_buf.dtype
            )
            v_buf[pl.ds(i * BLOCK, size)] = jnp.zeros(
                (size, hkv * d), v_buf.dtype
            )

    for i in range(pl.cdiv(s, BLOCK)):
        size = min(BLOCK, s - i * BLOCK)

        @pl.when(i * BLOCK < kv_len)
        def _(i=i, size=size):
            for c in copies(i, size):
                c.wait()

    scale = d ** -0.5
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (group, s), 1) < kv_len
    )
    compute_dtype = q_ref.dtype
    for h in range(hkv):
        q_h = q_ref[0, h * group:(h + 1) * group, :]          # [G, D]
        k_h = k_buf[:, h * d:(h + 1) * d]                      # [S, D]
        v_h = v_buf[:, h * d:(h + 1) * d]
        if quantized:
            k_h = k_h.astype(compute_dtype)
            v_h = v_h.astype(compute_dtype)
        scores = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                              # [G, S]
        if quantized:
            scores = scores * k_scale_ref[0, :, h][None, :]
        scores = jnp.where(valid, scores, MASK_VALUE)

        fresh_k_h = fresh_k_ref[0, h, :]
        self_score = jnp.sum(
            q_h.astype(jnp.float32) * fresh_k_h.astype(jnp.float32)[None, :],
            axis=-1, keepdims=True,
        ) * scale                                              # [G, 1]

        # stale-cache + fresh-self softmax without a lane-axis concat
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_score)
        e_cache = jnp.exp(scores - m)
        e_self = jnp.exp(self_score - m)
        denom = jnp.sum(e_cache, axis=-1, keepdims=True) + e_self
        cache_p = e_cache / denom
        if quantized:
            cache_p = cache_p * v_scale_ref[0, :, h][None, :]
        out_h = jax.lax.dot_general(
            cache_p.astype(compute_dtype), v_h,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_h = out_h + (e_self / denom) * fresh_v_ref[0, h, :].astype(
            jnp.float32
        )[None, :]
        o_ref[0, h * group:(h + 1) * group, :] = out_h.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnames=()
)
def decode_attention_tpu(
    q: jax.Array,          # [B, Hq, D]
    cache_k: jax.Array,    # [B, S, Hkv, D] bf16/int8
    cache_v: jax.Array,
    fresh_k: jax.Array,    # [B, Hkv, D]
    fresh_v: jax.Array,
    kv_len: jax.Array,     # scalar int32: valid cache prefix length
    k_scale: jax.Array | None = None,   # [B, S, Hkv] fp32
    v_scale: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused single-step decode attention; returns [B, Hq, D]."""
    b, s, hkv, d = cache_k.shape
    hq = q.shape[1]
    group = hq // hkv
    quantized = k_scale is not None

    k_flat = cache_k.reshape(b, s, hkv * d)
    v_flat = cache_v.reshape(b, s, hkv * d)
    if not quantized:  # dummies keep the kernel signature static
        k_scale = jnp.zeros((b, 1, hkv), jnp.float32)
        v_scale = jnp.zeros((b, 1, hkv), jnp.float32)

    n_blocks = pl.cdiv(s, BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, hkv, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + k_scale.shape[1:], lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + v_scale.shape[1:], lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s, hkv * d), cache_k.dtype),
            pltpu.VMEM((s, hkv * d), cache_v.dtype),
            pltpu.SemaphoreType.DMA((n_blocks, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, hkv=hkv, group=group, d=d, s=s, quantized=quantized
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(kv_len, jnp.int32).reshape(1),
        q, k_flat, v_flat, fresh_k, fresh_v, k_scale, v_scale,
    )


# ---------------------------------------------------------------------------
# Round-2: fused append+attend with in-kernel cache ownership
# ---------------------------------------------------------------------------


def _fused_kernel(
    idx_ref,       # SMEM scalar-prefetch: [2] int32 = (kv_len, layer)
    q_ref,         # VMEM [1, Hq, D]
    k_hbm,         # ANY  [L, B, S, Hkv*D] (bf16 or int8) — ALIASED to k_out
    v_hbm,         # ANY  [L, B, S, Hkv*D] — ALIASED to v_out
    fresh_k_ref,   # VMEM [1, Hkv, D] bf16
    fresh_v_ref,   # VMEM [1, Hkv, D]
    ks_ref,        # VMEM [1, 1, S, Hkv] fp32 blocked (dummy [1,1,1,Hkv] bf16 mode)
    vs_ref,        # VMEM
    o_ref,         # VMEM [1, Hq, D]
    k_out,         # ANY aliased k_hbm
    v_out,         # ANY aliased v_hbm
    ks_out,        # VMEM blocked, aliased ks_ref's buffer
    vs_out,        # VMEM blocked, aliased
    k_buf,         # VMEM scratch (S, Hkv*D) cache dtype
    v_buf,
    row_k,         # VMEM scratch (1, Hkv*D) cache dtype — staged fresh row
    row_v,
    k_tile,        # VMEM scratch (8, Hkv*D) — HBM read-modify-write tile
    v_tile,
    row_ks,        # VMEM scratch (1, Hkv) fp32
    row_vs,
    sems,          # DMA sems (n_blocks + 2, 2)
    *,
    hkv: int,
    group: int,
    d: int,
    s: int,
    quantized: bool,
):
    """One decode step for ONE layer: append the fresh K/V row at
    ``kv_len`` (quantizing in-VMEM when int8) into the ALIASED cache, and
    attend q over the valid prefix + the fresh row.

    The aliasing is the whole point (VERDICT round-1 parked this kernel):
    with the cache as a single linear carry consumed by ONE custom call
    that declares ``input_output_aliases``, XLA keeps the buffer in place
    through scan-in-while carries — measured flat per-step time across
    cache sizes in the alias probe — where the round-1 two-consumer layout
    (separate XLA update + Pallas read) forced a defensive copy per step.
    """
    b = pl.program_id(0)
    kv_len = idx_ref[0]
    layer = idx_ref[1]
    n_blocks = pl.cdiv(s, BLOCK)

    # ---- prefix slab reads (skip the invalid tail: bandwidth = time)
    def copies(i, size):
        return [
            pltpu.make_async_copy(
                k_hbm.at[layer, b, pl.ds(i * BLOCK, size)],
                k_buf.at[pl.ds(i * BLOCK, size)], sems.at[i, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, b, pl.ds(i * BLOCK, size)],
                v_buf.at[pl.ds(i * BLOCK, size)], sems.at[i, 1],
            ),
        ]

    for i in range(n_blocks):
        size = min(BLOCK, s - i * BLOCK)

        @pl.when(i * BLOCK < kv_len)
        def _(i=i, size=size):
            for c in copies(i, size):
                c.start()

        @pl.when(i * BLOCK >= kv_len)
        def _(i=i, size=size):
            k_buf[pl.ds(i * BLOCK, size)] = jnp.zeros((size, hkv * d), k_buf.dtype)
            v_buf[pl.ds(i * BLOCK, size)] = jnp.zeros((size, hkv * d), v_buf.dtype)

    # ---- stage the fresh row, then read-modify-write the 8-row HBM tile
    # containing position kv_len (Mosaic requires 8-row-aligned HBM slices;
    # rows < kv_len inside the tile are rewritten with the values just read,
    # row kv_len gets the fresh data, rows beyond are not yet valid)
    if quantized:
        # per-head scale rows as one vector op (scalar VMEM stores are not
        # lowerable on Mosaic)
        fk_all = fresh_k_ref[0].astype(jnp.float32)   # [hkv, d]
        fv_all = fresh_v_ref[0].astype(jnp.float32)
        row_ks[0, :] = jnp.maximum(
            jnp.max(jnp.abs(fk_all), axis=1) / 127.0, 1e-8
        )
        row_vs[0, :] = jnp.maximum(
            jnp.max(jnp.abs(fv_all), axis=1) / 127.0, 1e-8
        )
    for h in range(hkv):
        fk = fresh_k_ref[0, h, :].astype(jnp.float32)
        fv = fresh_v_ref[0, h, :].astype(jnp.float32)
        if quantized:
            # quantize with the SAME scale value stored in the plane above
            # (recomputing it here risked ulp divergence between the stored
            # scale and the one the row was quantized with)
            k_s = row_ks[0, h]
            v_s = row_vs[0, h]
            row_k[0, h * d:(h + 1) * d] = jnp.clip(
                jnp.round(fk / k_s), -127, 127
            ).astype(row_k.dtype)
            row_v[0, h * d:(h + 1) * d] = jnp.clip(
                jnp.round(fv / v_s), -127, 127
            ).astype(row_v.dtype)
        else:
            row_k[0, h * d:(h + 1) * d] = fk.astype(row_k.dtype)
            row_v[0, h * d:(h + 1) * d] = fv.astype(row_v.dtype)

    tile = (kv_len // 8) * 8
    off = kv_len - tile
    rk_tile = pltpu.make_async_copy(
        k_hbm.at[layer, b, pl.ds(tile, 8)], k_tile, sems.at[n_blocks + 1, 0]
    )
    rv_tile = pltpu.make_async_copy(
        v_hbm.at[layer, b, pl.ds(tile, 8)], v_tile, sems.at[n_blocks + 1, 1]
    )
    rk_tile.start()
    rv_tile.start()

    for i in range(n_blocks):
        size = min(BLOCK, s - i * BLOCK)

        @pl.when(i * BLOCK < kv_len)
        def _(i=i, size=size):
            for c in copies(i, size):
                c.wait()

    rk_tile.wait()
    rv_tile.wait()
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, hkv * d), 0)
    k_tile[...] = jnp.where(
        rows8 == off, jnp.broadcast_to(row_k[0][None, :], (8, hkv * d)),
        k_tile[...],
    )
    v_tile[...] = jnp.where(
        rows8 == off, jnp.broadcast_to(row_v[0][None, :], (8, hkv * d)),
        v_tile[...],
    )
    wk = pltpu.make_async_copy(
        k_tile, k_out.at[layer, b, pl.ds(tile, 8)], sems.at[n_blocks + 1, 0]
    )
    wv = pltpu.make_async_copy(
        v_tile, v_out.at[layer, b, pl.ds(tile, 8)], sems.at[n_blocks + 1, 1]
    )
    wk.start()
    wv.start()

    if quantized:
        # scale planes travel as Pallas-managed VMEM blocks ([S, Hkv] fp32,
        # ~20 KB); the aliased out block is the in block with the fresh row
        rows_s = jax.lax.broadcasted_iota(jnp.int32, (s, hkv), 0)
        ks_out[0, 0] = jnp.where(
            rows_s == kv_len,
            jnp.broadcast_to(row_ks[0][None, :], (s, hkv)),
            ks_ref[0, 0],
        )
        vs_out[0, 0] = jnp.where(
            rows_s == kv_len,
            jnp.broadcast_to(row_vs[0][None, :], (s, hkv)),
            vs_ref[0, 0],
        )

    # ---- attention over prefix + fresh (identical math to _kernel)
    scale = d ** -0.5
    valid = jax.lax.broadcasted_iota(jnp.int32, (group, s), 1) < kv_len
    compute_dtype = q_ref.dtype
    for h in range(hkv):
        q_h = q_ref[0, h * group:(h + 1) * group, :]
        k_h = k_buf[:, h * d:(h + 1) * d]
        v_h = v_buf[:, h * d:(h + 1) * d]
        if quantized:
            k_h = k_h.astype(compute_dtype)
            v_h = v_h.astype(compute_dtype)
        scores = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if quantized:
            scores = scores * ks_ref[0, 0, :, h][None, :]
        scores = jnp.where(valid, scores, MASK_VALUE)

        fresh_k_h = fresh_k_ref[0, h, :]
        self_score = jnp.sum(
            q_h.astype(jnp.float32) * fresh_k_h.astype(jnp.float32)[None, :],
            axis=-1, keepdims=True,
        ) * scale
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_score)
        e_cache = jnp.exp(scores - m)
        e_self = jnp.exp(self_score - m)
        denom = jnp.sum(e_cache, axis=-1, keepdims=True) + e_self
        cache_p = e_cache / denom
        if quantized:
            cache_p = cache_p * vs_ref[0, 0, :, h][None, :]
        out_h = jax.lax.dot_general(
            cache_p.astype(compute_dtype), v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_h = out_h + (e_self / denom) * fresh_v_ref[0, h, :].astype(
            jnp.float32
        )[None, :]
        o_ref[0, h * group:(h + 1) * group, :] = out_h.astype(o_ref.dtype)

    wk.wait()
    wv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_update_tpu(
    q: jax.Array,          # [B, Hq, D]
    cache_k: jax.Array,    # [L, B, S, Hkv*D] bf16/int8 — returned updated
    cache_v: jax.Array,
    fresh_k: jax.Array,    # [B, Hkv, D] bf16
    fresh_v: jax.Array,
    kv_len: jax.Array,     # scalar int32: fresh row index / valid prefix
    layer: jax.Array,      # scalar int32: which layer's cache plane
    k_scale: jax.Array | None = None,   # [L, B, S, Hkv] fp32
    v_scale: jax.Array | None = None,
    interpret: bool = False,
):
    """Fused decode attention that OWNS the cache: appends the fresh row at
    ``(layer, :, kv_len)`` in-kernel (int8-quantizing when scales given) and
    returns ``(out [B, Hq, D], cache_k', cache_v'[, k_scale', v_scale'])``
    with the caches aliased in-place.

    Pass the caches linearly (carry -> kernel -> carry) and nothing else may
    read them, or XLA inserts the defensive copy this design exists to avoid.
    """
    el, b, s, packed = cache_k.shape
    hq = q.shape[1]
    d = q.shape[2]
    hkv = packed // d
    group = hq // hkv
    quantized = k_scale is not None

    dummy = jnp.zeros((1, 1, 1, hkv), jnp.float32)
    ks = k_scale if quantized else dummy
    vs = v_scale if quantized else dummy

    n_blocks = pl.cdiv(s, BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, hkv, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1) + ks.shape[2:],
                (lambda i, idx: (idx[1], i, 0, 0)) if quantized
                else (lambda i, *_: (0, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1) + vs.shape[2:],
                (lambda i, idx: (idx[1], i, 0, 0)) if quantized
                else (lambda i, *_: (0, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 1) + ks.shape[2:],
                (lambda i, idx: (idx[1], i, 0, 0)) if quantized
                else (lambda i, *_: (0, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1) + vs.shape[2:],
                (lambda i, idx: (idx[1], i, 0, 0)) if quantized
                else (lambda i, *_: (0, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, packed), cache_k.dtype),
            pltpu.VMEM((s, packed), cache_v.dtype),
            pltpu.VMEM((1, packed), cache_k.dtype),
            pltpu.VMEM((1, packed), cache_v.dtype),
            pltpu.VMEM((8, packed), cache_k.dtype),
            pltpu.VMEM((8, packed), cache_v.dtype),
            pltpu.VMEM((1, hkv), jnp.float32),
            pltpu.VMEM((1, hkv), jnp.float32),
            pltpu.SemaphoreType.DMA((n_blocks + 2, 2)),
        ],
    )
    kernel = functools.partial(
        _fused_kernel, hkv=hkv, group=group, d=d, s=s, quantized=quantized
    )
    out_shapes = [
        jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        jax.ShapeDtypeStruct(ks.shape, jnp.float32),
        jax.ShapeDtypeStruct(vs.shape, jnp.float32),
    ]
    # inputs (incl. scalar prefetch at 0): 1=q 2=k 3=v 4=fk 5=fv 6=ks 7=vs
    aliases = {2: 1, 3: 2, 6: 3, 7: 4}
    idx = jnp.stack(
        [jnp.asarray(kv_len, jnp.int32), jnp.asarray(layer, jnp.int32)]
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024,
        ),
        interpret=interpret,
    )(idx, q, cache_k, cache_v, fresh_k, fresh_v, ks, vs)
    if quantized:
        return out, k2, v2, ks2, vs2
    return out, k2, v2
