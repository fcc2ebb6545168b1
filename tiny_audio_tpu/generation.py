"""KV-cached autoregressive generation as fused XLA loops.

Re-designed equivalent of the reference's ``language_model.generate`` hot loop
(``/root/reference/tiny_audio/asr_modeling.py:634-640``): greedy decoding with
EOS-set stopping, repetition penalty over the full seen-token set, and
min/max new-token bounds — implemented as a ``lax.while_loop`` over a
static-shape KV cache so the whole decode runs on-device with zero host syncs
until completion.  ``stream_generate`` exposes the same step as a host-visible
generator for token-by-token streaming (reference ``generate_streaming``,
asr_modeling.py:648-767).
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp

from tiny_audio_tpu.models.decoder import Qwen3Decoder


@dataclass(frozen=True)
class GenerationConfig:
    """Static generation hyperparameters (hashable: part of the jit key)."""

    max_new_tokens: int = 128
    min_new_tokens: int = 0
    eos_token_ids: tuple[int, ...] = ()
    pad_token_id: int = 0
    repetition_penalty: float = 1.0
    do_sample: bool = False
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    num_beams: int = 1
    length_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    # Also return per-row mean log-probability of the chosen tokens under
    # the RAW model distribution (pre penalty/ngram/eos-mask — the model's
    # own confidence, not the decode-time hacks').  Static: the False trace
    # is identical to not having the feature, so warm compile caches stay
    # valid; True compiles its own graph with the extra carry.
    return_scores: bool = False

    def __post_init__(self):
        if self.no_repeat_ngram_size == 1:
            raise ValueError(
                "no_repeat_ngram_size=1 bans every previously seen token; "
                "use repetition_penalty instead (sizes >= 2 are supported)"
            )

    @classmethod
    def from_asr_config(cls, cfg, eos_token_ids: Sequence[int], pad_token_id: int):
        return cls(
            max_new_tokens=cfg.max_new_tokens,
            min_new_tokens=cfg.min_new_tokens,
            eos_token_ids=tuple(eos_token_ids),
            pad_token_id=pad_token_id,
            repetition_penalty=cfg.repetition_penalty or 1.0,
            do_sample=cfg.do_sample,
            temperature=cfg.temperature,
            top_k=cfg.top_k,
            top_p=cfg.top_p,
            num_beams=cfg.num_beams or 1,
            length_penalty=cfg.length_penalty or 1.0,
            no_repeat_ngram_size=getattr(cfg, "no_repeat_ngram_size", 0) or 0,
        )


def _apply_repetition_penalty(logits: jax.Array, seen: jax.Array, penalty: float):
    """HF semantics: for seen tokens, divide positive logits / multiply
    negative logits by the penalty."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _ban_repeated_ngrams(logits: jax.Array, all_tokens: jax.Array,
                         cur_len: jax.Array, n: int) -> jax.Array:
    """HF ``no_repeat_ngram_size`` semantics (referenced at
    ``/root/reference/tiny_audio/asr_config.py:100-111``): ban any token that
    would complete an n-gram already present in the sequence.

    Vectorized for a fixed-shape decode loop: compare the trailing (n-1)-gram
    context against every (n-1) window of ``all_tokens`` (prompt + generated;
    positions >= cur_len are excluded), and -inf the token that followed each
    match.

    Args:
        logits: [B, V] next-token logits (fp32).
        all_tokens: [B, S] static ring of prompt + generated ids (future
            positions hold pad/sentinel values — masked out via ``cur_len``).
        cur_len: scalar int32, number of valid tokens in ``all_tokens``.
        n: static ngram size (>= 2).
    """
    b, smax = all_tokens.shape
    w = smax - (n - 1)
    ctx = jax.lax.dynamic_slice_in_dim(
        all_tokens, cur_len - (n - 1), n - 1, axis=1
    )  # [B, n-1] trailing context (clamped when cur_len < n-1; harmless,
    #    since then no valid window exists either)
    windows = jnp.stack(
        [all_tokens[:, j:j + w] for j in range(n - 1)], axis=-1
    )  # [B, w, n-1]
    match = jnp.all(windows == ctx[:, None, :], axis=-1)  # [B, w]
    # the followed token (at i+n-1) must already be generated: i+n-1 < cur_len
    valid = (jnp.arange(w) + (n - 1)) < cur_len
    next_tok = all_tokens[:, n - 1:]  # [B, w]
    # sentinel ids (< 0, e.g. an unseeded beam-search prompt region) never
    # match and never ban (negative scatter indices would wrap)
    match &= jnp.all(windows >= 0, axis=-1) & (next_tok >= 0)
    next_tok = jnp.maximum(next_tok, 0)
    ban = (
        jnp.zeros((b, logits.shape[-1]), bool)
        .at[jnp.arange(b)[:, None], next_tok]
        .max(match & valid[None, :], mode="drop")
    )
    return jnp.where(ban, jnp.finfo(logits.dtype).min, logits)


def _mask_eos(logits: jax.Array, eos_ids: tuple[int, ...], active: jax.Array):
    """Set EOS logits to -inf where ``active`` (min_new_tokens enforcement)."""
    neg = jnp.finfo(logits.dtype).min
    for eos in eos_ids:
        logits = logits.at[:, eos].set(jnp.where(active, neg, logits[:, eos]))
    return logits


def _select_token(logits: jax.Array, gen: GenerationConfig, rng: Optional[jax.Array]):
    """Greedy argmax or (temperature, top-k, top-p) sampling."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits.astype(jnp.float32)
    if gen.temperature and gen.temperature != 1.0:
        logits = logits / gen.temperature
    if gen.top_k:
        kth = jax.lax.top_k(logits, gen.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen.top_p and gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # number of tokens needed to reach top_p mass
        keep = jnp.sum(cum - probs < gen.top_p, axis=-1, keepdims=True)
        threshold = jnp.take_along_axis(sorted_logits, keep - 1, axis=-1)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _fused_decode_available(decoder: Qwen3Decoder) -> bool:
    """The in-kernel cache-ownership decode path (TA_PALLAS_DECODE=2):
    requires TPU, the kernel's head_dim-128 layout, and merged (no live
    LoRA) decoder weights."""
    import os

    if os.environ.get("TA_PALLAS_DECODE") != "2":
        return False
    cfg = decoder.cfg
    return (
        jax.devices()[0].platform == "tpu"
        and cfg.head_dim == 128
        and cfg.lora_rank == 0
    )


def generate_tokens(
    decoder: Qwen3Decoder,
    variables: Any,
    inputs_embeds: jax.Array,
    input_ids: jax.Array,
    gen: GenerationConfig,
    rng: Optional[jax.Array] = None,
    fused_decode: Optional[bool] = None,
    prompt_len: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Prefill + fused decode loop.

    Args:
        decoder: the bound ``Qwen3Decoder`` module (static).
        variables: decoder params.
        inputs_embeds: [B, T, H] prompt embeddings (audio already spliced).
        input_ids: [B, T] prompt ids (repetition-penalty bookkeeping,
            mirrors the reference passing both ids and embeds,
            asr_modeling.py:632-640).
        gen: static GenerationConfig.
        rng: PRNG key (sampling only).
        fused_decode: force the in-kernel cache-ownership decode path on/off;
            None resolves from TA_PALLAS_DECODE here, OUTSIDE the jit, so the
            env is re-read every call instead of being baked into a None-keyed
            trace (the round-1 env-sniffing-inside-jit trap).
        prompt_len: traced scalar count of REAL prompt rows when the caller
            right-padded the prompt to a static bucket (rows
            ``prompt_len..T-1`` are padding).  The graph stays keyed on the
            padded T only, so every distinct real length in a bucket reuses
            one compile; decoding starts at ``prompt_len``, progressively
            overwriting the padded cache rows (which the kv-validity mask
            excludes until then) — token-exact vs the unpadded call because
            causal attention never lets a real row see the later pad rows.
            None means the prompt is exact (t real rows).

    Returns:
        (tokens [B, max_new_tokens] int32 — pad_token_id after EOS,
         lengths [B] int32 — generated length including the EOS token).
        With ``gen.return_scores``, a third element: [B] float32 mean
        log-probability of the chosen tokens (incl. the EOS step) under the
        raw model distribution — ``exp()`` of it is a (0, 1] confidence.
    """
    if fused_decode is None:
        fused_decode = _fused_decode_available(decoder)
    if prompt_len is None:
        prompt_len = jnp.int32(inputs_embeds.shape[1])
    return _generate_tokens(
        decoder, variables, inputs_embeds, input_ids, gen, rng, fused_decode,
        jnp.asarray(prompt_len, jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("decoder", "gen", "fused_decode"),
    donate_argnames=(),
)
def _generate_tokens(
    decoder: Qwen3Decoder,
    variables: Any,
    inputs_embeds: jax.Array,
    input_ids: jax.Array,
    gen: GenerationConfig,
    rng: Optional[jax.Array],
    fused_decode: bool,
    prompt_len: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    cfg = decoder.cfg
    b, t, _ = inputs_embeds.shape
    s = -(-(t + gen.max_new_tokens) // 16) * 16  # 16-row align: Pallas DMA slabs
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache = decoder.init_cache(b, s, dtype=decoder.dtype)

    # ---- prefill ----
    # Pad rows (>= prompt_len) run through prefill too: causality keeps
    # them invisible to every real row, their cache rows stay masked until
    # the decode loop overwrites them, and their rotary positions are
    # irrelevant for the same reason.
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    prompt_pad = jnp.ones((b, t), jnp.int32)
    logits, cache = decoder.apply(
        variables, inputs_embeds, positions, padding_mask=prompt_pad,
        cache=cache, cache_index=0, last_logit_index=prompt_len - 1,
    )
    last_logits = logits[:, 0].astype(jnp.float32)

    prompt_valid = jnp.arange(t) < prompt_len  # [t], False on pad rows
    use_penalty = gen.repetition_penalty != 1.0
    if use_penalty:
        seen = jnp.zeros((b, cfg.vocab_size), dtype=bool)
        seen = seen.at[jnp.arange(b)[:, None], input_ids].max(
            jnp.broadcast_to(prompt_valid, (b, t))
        )
    else:
        seen = jnp.zeros((b, 1), dtype=bool)  # placeholder

    use_ngram = gen.no_repeat_ngram_size >= 2
    if use_ngram:
        # prompt + generated ids ring for ngram matching (future slots hold
        # pad — excluded by the cur_len mask inside _ban_repeated_ngrams)
        all_tokens = jnp.concatenate(
            [input_ids.astype(jnp.int32),
             jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
            axis=1,
        )
    else:
        all_tokens = jnp.zeros((b, 1), jnp.int32)  # placeholder

    def pick(logits_f32, step, seen, all_tokens, key):
        if use_penalty:
            logits_f32 = _apply_repetition_penalty(
                logits_f32, seen, gen.repetition_penalty
            )
        if use_ngram:
            logits_f32 = _ban_repeated_ngrams(
                logits_f32, all_tokens, prompt_len + step,
                gen.no_repeat_ngram_size
            )
        if gen.min_new_tokens > 0 and gen.eos_token_ids:
            logits_f32 = _mask_eos(
                logits_f32, gen.eos_token_ids,
                jnp.full((b,), True) & (step < gen.min_new_tokens),
            )
        return _select_token(logits_f32, gen, key)

    def is_eos(tok):
        hit = jnp.zeros_like(tok, dtype=bool)
        for eos in gen.eos_token_ids:
            hit |= tok == eos
        return hit

    # first generated token
    rng, key0 = jax.random.split(rng)
    tok0 = pick(last_logits, 0, seen, all_tokens, key0)
    finished0 = is_eos(tok0)
    tokens0 = jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    if use_penalty:
        seen = seen.at[jnp.arange(b), tok0].set(True)
    if use_ngram:
        # generated ids append at prompt_len (overwriting the right-pad
        # region first) so the ngram ring stays contiguous
        all_tokens = all_tokens.at[:, prompt_len].set(tok0)

    if fused_decode:
        from tiny_audio_tpu.ops.fused_decode import flatten_cache

        cache = flatten_cache(cache)

    state = {
        "cache": cache,
        "tokens": tokens0,
        "cur": tok0,
        "finished": finished0,
        "lengths": jnp.ones((b,), jnp.int32),  # incl. the (possible) EOS
        "seen": seen,
        "all_tokens": all_tokens,
        "step": jnp.int32(1),
        "rng": rng,
    }
    if gen.return_scores:
        logp0 = jax.nn.log_softmax(last_logits, axis=-1)
        state["logp_sum"] = jnp.take_along_axis(
            logp0, tok0[:, None], axis=1
        )[:, 0]

    def cond(st):
        return (st["step"] < gen.max_new_tokens) & ~jnp.all(st["finished"])

    def body(st):
        step = st["step"]
        pos = prompt_len + step - 1  # position of the token being fed
        if fused_decode:
            # in-kernel cache ownership: the step appends (layer-by-layer,
            # aliased in place) AND attends — ops/fused_decode.py
            from tiny_audio_tpu.ops.fused_decode import fused_decode_step

            logits_f32, new_cache = fused_decode_step(
                variables["params"], cfg, st["cur"], pos, st["cache"]
            )
        else:
            embeds = decoder.apply(
                variables, st["cur"][:, None], method=Qwen3Decoder.embed
            )
            kv_valid = (jnp.arange(s) < pos)[None, :].astype(jnp.int32)  # fresh pos appended in-kernel
            logits, new_cache = decoder.apply(
                variables, embeds, jnp.full((b, 1), pos, jnp.int32),
                step_kv_valid=kv_valid, cache=st["cache"], cache_index=pos,
            )
            logits_f32 = logits[:, 0].astype(jnp.float32)
        rng, key = jax.random.split(st["rng"])
        tok = pick(
            logits_f32, step, st["seen"],
            st["all_tokens"], key,
        )
        # frozen rows keep emitting pad
        tok = jnp.where(st["finished"], gen.pad_token_id, tok)
        tokens = st["tokens"].at[:, step].set(tok)
        finished = st["finished"] | is_eos(tok)
        lengths = jnp.where(st["finished"], st["lengths"], step + 1)
        seen = st["seen"]
        if use_penalty:
            seen = seen.at[jnp.arange(b), tok].set(True)
        all_toks = st["all_tokens"]
        if use_ngram:
            all_toks = all_toks.at[:, prompt_len + step].set(tok)
        out = {
            "cache": new_cache,
            "tokens": tokens,
            "cur": tok,
            "finished": finished,
            "lengths": lengths,
            "seen": seen,
            "all_tokens": all_toks,
            "step": step + 1,
            "rng": rng,
        }
        if gen.return_scores:
            # raw-distribution logp of the chosen token; rows already
            # finished BEFORE this step emit pad and accumulate nothing
            # (matching lengths, which also counts the EOS step itself)
            logp = jax.nn.log_softmax(logits_f32, axis=-1)
            logp_tok = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]
            out["logp_sum"] = st["logp_sum"] + jnp.where(
                st["finished"], 0.0, logp_tok
            )
        return out

    state = jax.lax.while_loop(cond, body, state)
    # rows still unfinished ran the full budget (loop-tracked: correct even
    # when pad_token_id is itself an EOS id, as with the default tokenizer)
    lengths = jnp.where(
        state["finished"], state["lengths"], gen.max_new_tokens
    )
    lengths = lengths.astype(jnp.int32)
    if gen.return_scores:
        scores = state["logp_sum"] / jnp.maximum(lengths, 1).astype(jnp.float32)
        return state["tokens"], lengths, scores
    return state["tokens"], lengths


@functools.partial(jax.jit, static_argnames=("decoder", "gen"))
def _stream_prefill(decoder, variables, inputs_embeds, input_ids, cache, rng,
                    gen, prompt_len):
    """Prefill + FIRST token selection as one graph (eager logit ops over the
    151k vocab through the remote-TPU tunnel cost ~30 ms per dispatch).

    ``prompt_len`` (traced): real prompt rows; the tail up to T is padding
    (see generate_tokens — same bucketed-prompt contract)."""
    b, t, _ = inputs_embeds.shape
    cfg = decoder.cfg
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    logits, new_cache = decoder.apply(
        variables, inputs_embeds, positions,
        padding_mask=jnp.ones((b, t), jnp.int32),
        cache=cache, cache_index=0, last_logit_index=prompt_len - 1,
    )
    last_logits = logits[:, 0].astype(jnp.float32)

    prompt_valid = jnp.arange(t) < prompt_len
    if gen.repetition_penalty != 1.0:
        seen = jnp.zeros((b, cfg.vocab_size), dtype=bool)
        seen = seen.at[jnp.arange(b)[:, None], input_ids].max(
            jnp.broadcast_to(prompt_valid, (b, t))
        )
    else:
        seen = jnp.zeros((b, 1), dtype=bool)
    if gen.no_repeat_ngram_size >= 2:
        all_tokens = jnp.concatenate(
            [input_ids.astype(jnp.int32),
             jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
            axis=1,
        )
    else:
        all_tokens = jnp.zeros((b, 1), jnp.int32)

    rng, key = jax.random.split(rng)
    if gen.repetition_penalty != 1.0:
        last_logits = _apply_repetition_penalty(last_logits, seen, gen.repetition_penalty)
    if gen.no_repeat_ngram_size >= 2:
        last_logits = _ban_repeated_ngrams(
            last_logits, all_tokens, prompt_len, gen.no_repeat_ngram_size
        )
    if gen.min_new_tokens > 0 and gen.eos_token_ids:
        last_logits = _mask_eos(
            last_logits, gen.eos_token_ids, jnp.full((b,), True)
        )
    tok = _select_token(last_logits, gen, key)
    if gen.repetition_penalty != 1.0:
        seen = seen.at[jnp.arange(b), tok].set(True)
    return tok, new_cache, seen, all_tokens, rng


@functools.partial(
    jax.jit, static_argnames=("decoder", "gen"),
    donate_argnames=("step_cache",),
)
def _stream_step(decoder, variables, cur, pos, t, step_cache, seen, all_tokens,
                 rng, gen):
    """One decode step: rng split, penalties, selection all in-graph — the
    only per-token host traffic is the token sync itself.

    ``pos`` and ``t`` are TRACED scalars on purpose: they only feed scalar
    arithmetic, and making either static would recompile this graph for
    every distinct prompt length (multi-second TTFB stall per new length)
    instead of keying the cache on (b, s, gen) alone."""
    b = cur.shape[0]
    s = step_cache["k"].shape[2]
    rng, key = jax.random.split(rng)
    embeds = decoder.apply(variables, cur[:, None], method=Qwen3Decoder.embed)
    kv_valid = (jnp.arange(s) < pos)[None, :].astype(jnp.int32)  # fresh pos appended in-kernel
    logits, new_cache = decoder.apply(
        variables, embeds, jnp.full((b, 1), pos, jnp.int32),
        step_kv_valid=kv_valid,
        cache=step_cache, cache_index=pos,
    )
    logits = logits[:, 0].astype(jnp.float32)
    if gen.repetition_penalty != 1.0:
        logits = _apply_repetition_penalty(logits, seen, gen.repetition_penalty)
    if gen.no_repeat_ngram_size >= 2:
        all_tokens = all_tokens.at[:, pos].set(cur)
        logits = _ban_repeated_ngrams(
            logits, all_tokens, pos + 1, gen.no_repeat_ngram_size
        )
    if gen.min_new_tokens > 0 and gen.eos_token_ids:
        logits = _mask_eos(
            logits, gen.eos_token_ids,
            jnp.full((b,), True) & (pos - t + 1 < gen.min_new_tokens),
        )
    tok = _select_token(logits, gen, key)
    if gen.repetition_penalty != 1.0:
        seen = seen.at[jnp.arange(b), tok].set(True)
    return tok, new_cache, seen, all_tokens, rng


def stream_generate(
    decoder: Qwen3Decoder,
    variables: Any,
    inputs_embeds: jax.Array,
    input_ids: jax.Array,
    gen: GenerationConfig,
    rng: Optional[jax.Array] = None,
    prompt_len: Optional[int] = None,
) -> Iterator[int]:
    """Token-by-token generator (batch size 1): prefill once, then one jitted
    step per token — the TTFB-optimized streaming path.

    The prefill/step graphs live at module scope so their jit caches persist
    across calls (per-utterance closures would retrace every request), and
    every logit-sized op is in-graph; the only per-token host op is the
    token sync that feeds the stream.

    ``prompt_len``: host int count of real prompt rows when the caller
    right-padded to a static bucket (generate_tokens contract) — it feeds
    traced scalars only, so one prefill graph serves the whole bucket."""
    assert inputs_embeds.shape[0] == 1, "streaming is defined for batch 1"

    b, t, _ = inputs_embeds.shape
    plen = t if prompt_len is None else int(prompt_len)
    s = -(-(t + gen.max_new_tokens) // 16) * 16  # 16-row align: Pallas DMA slabs
    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache = decoder.init_cache(b, s, dtype=decoder.dtype)
    tok, cache, seen, all_tokens, rng = _stream_prefill(
        decoder, variables, inputs_embeds, input_ids, cache, rng, gen,
        jnp.int32(plen),
    )

    eos = set(gen.eos_token_ids)
    for step in range(gen.max_new_tokens):
        tok_host = int(tok[0])
        if tok_host in eos:
            return
        yield tok_host
        if step == gen.max_new_tokens - 1:
            return
        tok, cache, seen, all_tokens, rng = _stream_step(
            decoder, variables, tok, plen + step, plen, cache, seen,
            all_tokens, rng, gen,
        )


def generate_beams(
    decoder: Qwen3Decoder,
    variables: Any,
    inputs_embeds: jax.Array,
    gen: GenerationConfig,
    input_ids: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Beam-search decoding as one fused XLA loop.

    Standard length-normalized beam search (HF-style ``early_stopping=False``
    semantics approximated: beams that emit EOS are frozen with a final score
    ``cum_logprob / len**length_penalty``; the loop runs until every beam is
    finished or the token budget ends, then the best-scoring beam per row is
    returned).  The reference exposes ``num_beams`` through its config but
    every published recipe decodes greedily (asr_config.py:104), so exact HF
    hypothesis-heap semantics are not part of the parity surface.

    Honors ``repetition_penalty`` (per-beam seen-token sets, seeded from
    ``input_ids`` when given) and ``min_new_tokens`` (EOS masked while
    active), matching ``generate_tokens``.

    Args:
        inputs_embeds: [B, T, H] prompt embeddings (audio already spliced).
        input_ids: optional [B, T] prompt ids for repetition-penalty seeding.
    Returns:
        (tokens [B, max_new_tokens] int32, pad after EOS; scores [B] float32).
    """
    cfg = decoder.cfg
    k = gen.num_beams
    b, t, h = inputs_embeds.shape
    s = -(-(t + gen.max_new_tokens) // 16) * 16  # 16-row align: Pallas DMA slabs
    neg_inf = jnp.float32(-1e30)

    # ---- prefill once per row, then replicate state across beams
    cache = decoder.init_cache(b, s, dtype=decoder.dtype)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    logits, cache = decoder.apply(
        variables, inputs_embeds, positions,
        padding_mask=jnp.ones((b, t), jnp.int32), cache=cache, cache_index=0,
        last_logit_only=True,
    )
    first_logits = logits[:, -1].astype(jnp.float32)
    vocab = first_logits.shape[-1]
    use_penalty = gen.repetition_penalty != 1.0
    if use_penalty:
        seen_prompt = jnp.zeros((b, vocab), dtype=bool)
        if input_ids is not None:
            seen_prompt = seen_prompt.at[
                jnp.arange(b)[:, None], input_ids
            ].set(True)
        first_logits = _apply_repetition_penalty(
            first_logits, seen_prompt, gen.repetition_penalty
        )
    use_ngram = gen.no_repeat_ngram_size >= 2
    if use_ngram:
        prompt_ids = (
            input_ids.astype(jnp.int32) if input_ids is not None
            else jnp.full((b, t), -1, jnp.int32)  # sentinel: never matches
        )
        row_tokens = jnp.concatenate(
            [prompt_ids,
             jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)],
            axis=1,
        )
        first_logits = _ban_repeated_ngrams(
            first_logits, row_tokens, jnp.int32(t), gen.no_repeat_ngram_size
        )
    if gen.min_new_tokens > 0 and gen.eos_token_ids:
        first_logits = _mask_eos(
            first_logits, gen.eos_token_ids, jnp.full((b,), True)
        )
    first_logprobs = jax.nn.log_softmax(first_logits, axis=-1)  # [B, V]

    def rep(x):  # [., B, ...] -> beam-major [., B*K, ...] along the batch axis
        return jnp.repeat(x, k, axis=1)

    cache = {name: rep(buf) for name, buf in cache.items()}

    # first token: top-k of the first distribution seeds the beams
    top_lp, top_tok = jax.lax.top_k(first_logprobs, k)  # [B, K]
    tokens0 = jnp.full((b, k, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(top_tok)

    def is_eos(tok):
        hit = jnp.zeros_like(tok, dtype=bool)
        for eos in gen.eos_token_ids:
            hit |= tok == eos
        return hit

    finished0 = is_eos(top_tok)
    lengths0 = jnp.ones((b, k), jnp.int32)

    if use_penalty:
        seen0 = jnp.repeat(seen_prompt[:, None, :], k, axis=1)  # [B, K, V]
        seen0 = seen0.at[
            jnp.arange(b)[:, None], jnp.arange(k)[None, :], top_tok
        ].set(True)
    else:
        seen0 = jnp.zeros((b, k, 1), dtype=bool)  # placeholder

    if use_ngram:
        all0 = jnp.repeat(row_tokens[:, None, :], k, axis=1)  # [B, K, S]
        all0 = all0.at[
            jnp.arange(b)[:, None], jnp.arange(k)[None, :], t
        ].set(top_tok)
    else:
        all0 = jnp.zeros((b, k, 1), jnp.int32)  # placeholder

    state = {
        "cache": cache,
        "tokens": tokens0,
        "cum": top_lp,                   # [B, K] cumulative logprob
        "cur": top_tok,                  # [B, K]
        "finished": finished0,
        "lengths": lengths0,
        "seen": seen0,
        "all_tokens": all0,
        "step": jnp.int32(1),
    }

    def cond(st):
        return (st["step"] < gen.max_new_tokens) & ~jnp.all(st["finished"])

    def body(st):
        step = st["step"]
        pos = t + step - 1
        flat_cur = st["cur"].reshape(b * k)
        embeds = decoder.apply(variables, flat_cur[:, None], method=Qwen3Decoder.embed)
        kv_valid = (jnp.arange(s) < pos)[None, :].astype(jnp.int32)
        logits, new_cache = decoder.apply(
            variables, embeds, jnp.full((b * k, 1), pos, jnp.int32),
            step_kv_valid=kv_valid, cache=st["cache"], cache_index=pos,
        )
        step_logits = logits[:, 0].astype(jnp.float32)
        if use_penalty:
            step_logits = _apply_repetition_penalty(
                step_logits, st["seen"].reshape(b * k, -1),
                gen.repetition_penalty,
            )
        if use_ngram:
            step_logits = _ban_repeated_ngrams(
                step_logits, st["all_tokens"].reshape(b * k, -1),
                t + step, gen.no_repeat_ngram_size,
            )
        if gen.min_new_tokens > 0 and gen.eos_token_ids:
            step_logits = _mask_eos(
                step_logits, gen.eos_token_ids,
                jnp.full((b * k,), True) & (step < gen.min_new_tokens),
            )
        logprobs = jax.nn.log_softmax(step_logits, axis=-1).reshape(b, k, -1)
        v = logprobs.shape[-1]

        # finished beams may only extend with pad at zero cost
        pad_only = jnp.full((v,), neg_inf).at[gen.pad_token_id].set(0.0)
        logprobs = jnp.where(
            st["finished"][:, :, None], pad_only[None, None, :], logprobs
        )

        cand = st["cum"][:, :, None] + logprobs  # [B, K, V]
        flat = cand.reshape(b, k * v)
        new_cum, idx = jax.lax.top_k(flat, k)      # [B, K]
        beam_idx = idx // v                        # parent beam
        tok = (idx % v).astype(jnp.int32)

        gather = jnp.arange(b)[:, None] * k + beam_idx  # flat [B, K] indices
        # reorder beam-dependent state by parent beam
        tokens = st["tokens"].reshape(b * k, -1)[gather.reshape(-1)].reshape(
            b, k, -1
        )
        parent_finished = jnp.take_along_axis(st["finished"], beam_idx, axis=1)
        parent_lengths = jnp.take_along_axis(st["lengths"], beam_idx, axis=1)
        seen = st["seen"]
        if use_penalty:
            seen = seen.reshape(b * k, -1)[gather.reshape(-1)].reshape(b, k, -1)
        # reorder every cache buffer (k/v and, when quantized, their scales)
        new_cache = {
            name: buf[:, gather.reshape(-1)] for name, buf in new_cache.items()
        }

        tok = jnp.where(parent_finished, gen.pad_token_id, tok)
        tokens = tokens.at[:, :, step].set(tok)
        finished = parent_finished | is_eos(tok)
        lengths = jnp.where(parent_finished, parent_lengths, parent_lengths + 1)
        if use_penalty:
            seen = seen.at[
                jnp.arange(b)[:, None], jnp.arange(k)[None, :], tok
            ].set(True)
        allt = st["all_tokens"]
        if use_ngram:
            allt = allt.reshape(b * k, -1)[gather.reshape(-1)].reshape(b, k, -1)
            allt = allt.at[
                jnp.arange(b)[:, None], jnp.arange(k)[None, :], t + step
            ].set(tok)

        return {
            "cache": new_cache,
            "tokens": tokens,
            "cum": new_cum,
            "cur": tok,
            "finished": finished,
            "lengths": lengths,
            "seen": seen,
            "all_tokens": allt,
            "step": step + 1,
        }

    state = jax.lax.while_loop(cond, body, state)

    # length-normalized final scores; pick the best beam per row
    scores = state["cum"] / (
        state["lengths"].astype(jnp.float32) ** gen.length_penalty
    )
    best = jnp.argmax(scores, axis=1)  # [B]
    tokens = jnp.take_along_axis(
        state["tokens"], best[:, None, None], axis=1
    )[:, 0]
    return tokens, jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Continuous batching (slot-based decode) — device ops
# ---------------------------------------------------------------------------
# The engine lives in tiny_audio_tpu/continuous.py; these are its three
# jitted graphs.  Design: N persistent decode slots share one KV cache
# [L, N, S, Hkv, D]; each slot sits at its OWN length (``pos`` [N]), so a
# request can join the moment a slot frees instead of waiting for the whole
# batch (the uniform-batch ``generate_tokens`` early-exits only when ALL
# rows finish).  The per-step cache write becomes a (batch, seq) scatter —
# decoder.Qwen3Decoder supports array ``cache_index`` for exactly this.
# The reference has no serving engine at all (single-request HF endpoint
# handler, /root/reference/tiny_audio/handler.py); this is TPU-native
# serving machinery in the vein of slot-based TPU LLM servers.


@functools.partial(jax.jit, static_argnames=("decoder",))
def prefill_prompt_cache(decoder, variables, inputs_embeds, prompt_len=None):
    """Prefill ONLY: prompt cache (sized to the prompt bucket) + greedy
    first token.  The engine scatters the result into free slots.

    ``prompt_len``: traced scalar count of REAL prompt rows when the
    caller right-padded the prompt to a PROMPT_BUCKET multiple (the
    generate_tokens contract) — pad rows are causally invisible, the
    first token reads logits at ``prompt_len - 1``, and the garbage cache
    rows ``>= prompt_len`` stay masked by the engine's per-slot kv-valid
    until decode overwrites them.  Keeps the graph keyed on the bucket
    shape, not the exact token count.

    Greedy-default semantics only (the serving default: no repetition
    penalty / ngram ban / sampling — ``ContinuousEngine`` refuses other
    configs up front)."""
    b, t, _ = inputs_embeds.shape
    if prompt_len is None:
        prompt_len = jnp.int32(t)
    s = -(-t // 16) * 16  # 16-align like _generate_tokens
    cache = decoder.init_cache(b, s, dtype=decoder.dtype)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    logits, cache = decoder.apply(
        variables, inputs_embeds, positions,
        padding_mask=jnp.ones((b, t), jnp.int32),
        cache=cache, cache_index=0, last_logit_index=prompt_len - 1,
    )
    tok0 = jnp.argmax(logits[:, 0].astype(jnp.float32), axis=-1).astype(
        jnp.int32
    )
    return tok0, cache


def init_slot_state(decoder, n_slots: int, s_max: int, pad_token_id: int):
    """Fresh engine state: all slots empty/finished."""
    return {
        "cache": decoder.init_cache(n_slots, s_max, dtype=decoder.dtype),
        "cur": jnp.full((n_slots,), pad_token_id, jnp.int32),
        # next cache write index per slot == current sequence length
        "pos": jnp.zeros((n_slots,), jnp.int32),
        "start": jnp.zeros((n_slots,), jnp.int32),  # prompt length
        "finished": jnp.ones((n_slots,), bool),
    }


@functools.partial(jax.jit, donate_argnames=("state",))
def insert_slots(state, prompt_cache, first_toks, slot_ids, t_real,
                 first_finished):
    """Scatter ``b`` prefilled requests into slots ``slot_ids``.

    ``prompt_cache`` arrays are [L, b, s_p, ...] with s_p <= s_max; the
    cache copy writes each row's full [L, s_p, Hkv, D] block once (~6 MB
    int8 per row at serving shapes — once per request, not per step)."""
    s_p = prompt_cache["k"].shape[2]
    cache = dict(state["cache"])
    for name, buf in prompt_cache.items():
        cache[name] = state["cache"][name].at[:, slot_ids, :s_p].set(
            buf, unique_indices=True
        )
    return {
        "cache": cache,
        "cur": state["cur"].at[slot_ids].set(first_toks),
        "pos": state["pos"].at[slot_ids].set(t_real),
        "start": state["start"].at[slot_ids].set(t_real),
        "finished": state["finished"].at[slot_ids].set(first_finished),
    }


@functools.partial(
    jax.jit, static_argnames=("decoder", "gen", "n_steps"),
    donate_argnames=("state",),
)
def decode_chunk(decoder, variables, state, gen: GenerationConfig,
                 n_steps: int):
    """Run ``n_steps`` greedy decode steps over all slots; returns
    (state, tokens [N, n_steps]).  Finished/empty slots emit pad and do not
    advance.  The host drains tokens after each chunk, resolves finished
    slots, and inserts new work — at most ``n_steps - 1`` wasted steps per
    finished row between drains."""
    s_max = state["cache"]["k"].shape[2]

    def is_eos(tok):
        hit = jnp.zeros_like(tok, dtype=bool)
        for eos in gen.eos_token_ids:
            hit |= tok == eos
        return hit

    def body(st, _):
        embeds = decoder.apply(
            variables, st["cur"][:, None], method=Qwen3Decoder.embed
        )
        kv_valid = (
            jnp.arange(s_max)[None, :] < st["pos"][:, None]
        ).astype(jnp.int32)
        logits, new_cache = decoder.apply(
            variables, embeds, st["pos"][:, None],
            step_kv_valid=kv_valid, cache=st["cache"],
            cache_index=st["pos"],
        )
        tok = jnp.argmax(logits[:, 0].astype(jnp.float32), axis=-1).astype(
            jnp.int32
        )
        tok = jnp.where(st["finished"], gen.pad_token_id, tok)
        # invariant: pos = start + g - 1 with g = tokens generated so far
        # (the prefill emitted the first one); this step makes it g+1 =
        # pos - start + 2
        budget_done = (st["pos"] - st["start"] + 2) >= gen.max_new_tokens
        overflow = st["pos"] + 1 >= s_max  # defensive: never write past S
        finished = st["finished"] | is_eos(tok) | budget_done | overflow
        pos = jnp.where(st["finished"], st["pos"], st["pos"] + 1)
        return {
            "cache": new_cache,
            "cur": tok,
            "pos": pos,
            "start": st["start"],
            "finished": finished,
        }, tok

    state, toks = jax.lax.scan(body, state, None, length=n_steps)
    return state, toks.T  # [N, n_steps]
