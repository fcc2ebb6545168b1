"""ASRModel: frozen audio encoder + trainable projector + frozen LM, one graph.

Re-designed equivalent of the reference ``ASRModel``
(``/root/reference/tiny_audio/asr_modeling.py:47-869``).  The PyTorch original
composes three HF modules and splices audio embeddings into the prompt with
``masked_scatter``; here the whole inference path — mel mask -> encoder ->
projector -> splice -> KV-cached decode — is one jitted XLA computation per
(mel-bucket, prompt-bucket) shape.

Splice semantics: row-aligned — the j-th ``<audio>`` placeholder of row b
receives ``audio_embeds[b, j]``.  This is exactly the reference semantics for
training batches (placeholder counts equal per-row token counts,
asr_modeling.py:500-515) and for generation (the reference builds every
prompt with the batch-max token count, :593-605; its masked_scatter would
bleed embeddings across rows for heterogeneous batches — a latent reference
bug we do not replicate).

Freezing: the encoder (and the LM unless ``freeze_language_model=False``) is
wrapped in ``stop_gradient`` inside the loss, the optimizer only sees the
projector (+ LoRA) leaves, and ``audio_token_dropout`` reproduces the
SpecAugment-style frame dropout (asr_modeling.py:458-479).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from tiny_audio_tpu.config import ASRConfig, compute_encoder_output_length
from tiny_audio_tpu.generation import (
    GenerationConfig,
    generate_beams,
    generate_tokens,
    stream_generate,
)
from tiny_audio_tpu.models.decoder import Qwen3Decoder
from tiny_audio_tpu.models.encoder import AudioEncoder
from tiny_audio_tpu.models.projectors import create_projector
from tiny_audio_tpu.tokenization import AUDIO_TOKEN, ByteTokenizer, HFTokenizerAdapter

TRANSCRIBE_PROMPT = "Transcribe the speech to text"

#: generate-time prompts are right-padded to a multiple of this, bounding
#: the number of distinct prefill/decode graph shapes (audio-token counts
#: track real mel length exactly — a parity contract — so without
#: bucketing every distinct clip duration is its own compile).  64 tokens
#: ≈ 5 s of audio per bucket at the MLP projector's 12.5 Hz; worst-case
#: prefill overhead is 63 padded rows on a ~500-row prompt.
PROMPT_BUCKET = 64


def _is_lora_path(path) -> bool:
    return any("lora" in str(getattr(k, "key", k)) for k in path)


def split_lora(params: dict) -> tuple[dict, dict]:
    """Partition a decoder param tree into (base, lora) sub-trees, so base
    checkpoints stay loadable whether or not LoRA is attached (the PEFT
    adapter-file analogue, reference asr_modeling.py:796-823)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    base = {k: v for k, v in flat.items() if not any("lora" in p for p in k)}
    lora = {k: v for k, v in flat.items() if any("lora" in p for p in k)}
    return traverse_util.unflatten_dict(base), traverse_util.unflatten_dict(lora)


def merge_lora(base: dict, lora: dict) -> dict:
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(base))
    flat.update(traverse_util.flatten_dict(lora))
    return traverse_util.unflatten_dict(flat)


def splice_audio(
    text_embeds: jax.Array,
    audio_token_mask: jax.Array,
    audio_embeds: jax.Array,
) -> jax.Array:
    """Row-aligned splice: j-th True position of row b <- audio_embeds[b, j]."""
    idx_in_row = jnp.cumsum(audio_token_mask, axis=1) - 1
    idx_in_row = jnp.clip(idx_in_row, 0, audio_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(audio_embeds, idx_in_row[:, :, None], axis=1)
    return jnp.where(
        audio_token_mask[:, :, None], gathered.astype(text_embeds.dtype), text_embeds
    )


def filter_think_stream(chunks):
    """Incrementally strip ``<think>…</think>`` spans from a stream of text
    chunks (reference asr_modeling.py:736-765).

    Tags are consumed in POSITIONAL order, alternating with state: one chunk
    can contain ``</think>hi <think>``, and handling ``<think>`` first
    regardless of state would leak the buffered think content (plus a
    literal ``</think>``) to the client.
    """
    in_think = False
    buffer = ""
    for text in chunks:
        buffer += text
        while True:
            if in_think:
                if "</think>" not in buffer:
                    break
                in_think = False
                buffer = buffer.split("</think>", 1)[1]
            else:
                if "<think>" not in buffer:
                    break
                before, buffer = buffer.split("<think>", 1)
                if before:
                    yield before
                in_think = True
        if not in_think and buffer:
            # hold back a trailing PARTIAL '<think' prefix — the tag can be
            # split across decode chunks, and flushing 'a<thi' here would
            # leak it before the rest of the tag arrives
            hold = 0
            for k in range(min(len("<think>") - 1, len(buffer)), 0, -1):
                if buffer.endswith("<think>"[:k]):
                    hold = k
                    break
            out, buffer = buffer[: len(buffer) - hold], buffer[len(buffer) - hold:]
            if out:
                yield out
    if buffer and not in_think:
        yield buffer  # a partial tag at stream end is real text


class ASRModel:
    """Composition + orchestration.  Parameters live in a plain pytree::

        {"encoder": ..., "decoder": ..., "projector": ...}

    so freezing, optimizer masking, and sharding rules address towers by name.
    """

    TRANSCRIBE_PROMPT = TRANSCRIBE_PROMPT

    def __init__(
        self,
        config: ASRConfig,
        tokenizer=None,
        params: Optional[dict] = None,
        seed: int = 0,
        mesh=None,
    ):
        self.config = config
        dtype = jnp.bfloat16 if config.model_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        self.encoder = AudioEncoder(config.encoder, dtype=dtype, param_dtype=dtype)
        import dataclasses as _dc

        dec_cfg = config.decoder
        if config.use_lora:
            dec_cfg = _dc.replace(
                dec_cfg,
                lora_rank=config.lora_rank,
                lora_alpha=float(config.lora_alpha),
                lora_targets=tuple(config.lora_target_modules),
            )
        if config.gradient_checkpointing and not dec_cfg.gradient_checkpointing:
            dec_cfg = _dc.replace(dec_cfg, gradient_checkpointing=True)
        if config.kv_cache_dtype != dec_cfg.kv_cache_dtype:
            # non-default side wins; conflicting customizations are an error
            # (same contract as the encoder_conv_layers sync in config.py)
            if dec_cfg.kv_cache_dtype == "bfloat16":
                dec_cfg = _dc.replace(dec_cfg, kv_cache_dtype=config.kv_cache_dtype)
            elif config.kv_cache_dtype != "bfloat16":
                raise ValueError(
                    "kv_cache_dtype disagrees between ASRConfig "
                    f"({config.kv_cache_dtype!r}) and DecoderConfig "
                    f"({dec_cfg.kv_cache_dtype!r})"
                )
        self.decoder = Qwen3Decoder(dec_cfg, dtype=dtype, param_dtype=dtype)
        self.projector = create_projector(config, dtype=dtype, param_dtype=jnp.float32)
        self.tokenizer = tokenizer or ByteTokenizer(config.decoder.vocab_size)
        self.system_prompt = config.system_prompt
        self.mesh = mesh
        self.params = params if params is not None else self.init_params(seed)
        self.gen_config = GenerationConfig.from_asr_config(
            config, self.tokenizer.eos_token_ids, self.tokenizer.pad_token_id
        )
        self.wq: Optional[dict] = None  # int8 decode weights (opt-in)

    def enable_wq_decode(self) -> None:
        """Opt-in weight-only int8 decode: quantize the decoder's matmul
        weights into a ``wq`` variables collection read ONLY by T==1
        decode steps (prefill/training stay bf16).  Serving bandwidth
        machinery — decode is weight-read-bound — with a measured
        quality trade (per-channel int8, ops/wq_matmul.py); incompatible
        with the (also opt-in) fused Pallas decode loop, which reads the
        bf16 params directly."""
        from tiny_audio_tpu.models.decoder import quantize_decoder_wq

        self.wq = jax.tree.map(
            jnp.asarray,
            quantize_decoder_wq(self.params["decoder"], self.decoder.cfg),
        )

    def enable_w8a8_head(self) -> None:
        """Opt-in W8A8 LM head for T==1 decode logits: native int8 x int8
        MXU dot off the transposed int8 head (ops/wq_head.py) — measured
        22% faster than the bf16 head dot at serving batch (0.730 vs
        0.941 ms), where the weight-only wq head LOSES (1.281 ms).  A real
        numerics trade (activation quantization too); never a default
        until the networked parity run pins the WER delta (PARITY.md).
        Composes with enable_wq_decode (the W8A8 head then takes
        precedence for logits; layer matmuls stay on whichever path that
        mode selected)."""
        from tiny_audio_tpu.ops.wq_head import quantize_head_w8a8

        dcfg, dparams = self.decoder.cfg, self.params["decoder"]
        head = (dparams["embed_tokens"]["embedding"].T
                if dcfg.tie_word_embeddings else dparams["lm_head"]["kernel"])
        wt_i8, scale = quantize_head_w8a8(head)
        wq = dict(self.wq) if self.wq is not None else {}
        wq["head_t_i8"] = jnp.asarray(wt_i8)
        wq["head_w8a8_scale"] = jnp.asarray(scale)
        self.wq = wq

    def enable_w8a8_decode(self) -> None:
        """Opt-in W8A8 decode for ALL T==1 matmuls — layer projections AND
        the LM head: per-output-channel int8 weights stored transposed
        [N, K], per-row dynamic int8 activations, native int8 x int8 MXU
        dots (no dequant convert on the critical path — the defect that
        sank weight-only wq decode).  Measured on this chip: layer-matmul
        stage 2.162 vs 2.707 ms/step (scripts/bench_w8a8_decode.py), head
        0.730 vs 0.941 ms (scripts/bench_wq_head.py).  Prefill, training
        and beams keep the untouched bf16 params.

        Supersedes enable_wq_decode + enable_w8a8_head separately (it
        quantizes both layers and head in W8A8 form); a real numerics
        trade (activation quantization), so never a silent default —
        WER-neutrality needs the networked parity run (PARITY.md)."""
        from tiny_audio_tpu.models.decoder import quantize_decoder_w8a8

        self.wq = jax.tree.map(
            jnp.asarray,
            quantize_decoder_w8a8(self.params["decoder"], self.decoder.cfg),
        )

    def decoder_variables(self, params: Optional[dict] = None) -> dict:
        """Decoder ``apply`` variables: params + the wq collection when
        weight-quantized decode is enabled."""
        v = {"params": (params if params is not None else self.params)["decoder"]}
        if self.wq is not None:
            v["wq"] = self.wq
        return v

    # ------------------------------------------------------------------ init

    def init_params(self, seed: int = 0) -> dict:
        cfg = self.config

        # The whole init runs as ONE jitted computation.  Un-jitted, flax
        # Module.init dispatches every primitive as its own tiny XLA
        # program — ~200 separate compile+execute round-trips which, on a
        # remote-tunnel TPU, serialize into minutes of first-call latency
        # billed to whatever graph runs next (the round-4/5 driver benches'
        # "cold compile" was mostly this queue draining, not compilation —
        # docs/performance.md "Where the warm-boot time actually goes").
        # One jit = one (persistently cacheable) compile + one execution.
        def _init(key):
            k_enc, k_dec, k_proj = jax.random.split(key, 3)
            mel = jnp.zeros((1, cfg.encoder.num_mel_bins, 32), self.dtype)
            enc_vars = self.encoder.init(k_enc, mel)
            enc_out_dim = cfg.encoder.d_model
            embeds = jnp.zeros((1, 8, cfg.decoder.hidden_size), self.dtype)
            positions = jnp.zeros((1, 8), jnp.int32)
            dec_vars = self.decoder.init(k_dec, embeds, positions)
            proj_in = jnp.zeros((1, 16, enc_out_dim), self.dtype)
            proj_vars = self.projector.init(
                {"params": k_proj, "jitter": k_proj, "dropout": k_proj},
                proj_in, train=False,
            )
            return {
                "encoder": enc_vars["params"],
                "decoder": dec_vars["params"],
                "projector": proj_vars["params"],
            }

        return jax.jit(_init)(jax.random.PRNGKey(seed))

    # ------------------------------------------------------------- audio path

    def _encode_audio(
        self,
        params: dict,
        input_features: jax.Array,
        audio_attention_mask: jax.Array,
        train: bool = False,
        rngs: Optional[dict] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Mel -> encoder (frozen) -> optional frame dropout -> projector.

        Returns ([B, T_proj, llm_dim] audio embeds, scalar aux loss).
        """
        # Stop-gradient the PARAMS (not just the output): the encoder is
        # always frozen (reference asr_modeling.py:203-237), and cutting
        # tangents at the input elides the entire encoder backward pass from
        # the compiled train step instead of computing-then-discarding it.
        hidden = self.encoder.apply(
            {"params": jax.lax.stop_gradient(params["encoder"])},
            jax.lax.stop_gradient(input_features),
            frame_mask=audio_attention_mask,
        )
        hidden = jax.lax.stop_gradient(hidden)

        p = float(self.config.audio_token_dropout)
        if train and p > 0.0 and rngs and "dropout" in rngs:
            keep = jax.random.bernoulli(rngs["dropout"], 1.0 - p, hidden.shape[:-1])
            hidden = hidden * keep[..., None].astype(hidden.dtype)

        proj_rngs = {}
        if train and rngs:
            proj_rngs = {k: v for k, v in rngs.items() if k in ("jitter", "dropout")}
        audio_embeds, aux = self.projector.apply(
            {"params": params["projector"]}, hidden, train=train,
            rngs=proj_rngs or None,
        )
        return audio_embeds, aux

    # --------------------------------------------------------------- training

    def compute_loss(
        self,
        params: dict,
        batch: dict,
        train: bool = True,
        rngs: Optional[dict] = None,
    ) -> tuple[jax.Array, dict]:
        """Causal-LM loss over assistant tokens + projector aux loss.

        batch: input_ids [B,T], attention_mask [B,T], labels [B,T] (-100
        masked), input_features [B,mel,Tm], audio_attention_mask [B,Tm].
        """
        input_ids = batch["input_ids"]
        labels = batch["labels"]
        attn = batch["attention_mask"]

        audio_embeds, aux = self._encode_audio(
            params, batch["input_features"], batch["audio_attention_mask"],
            train=train, rngs=rngs,
        )

        dec_params = params["decoder"]
        if self.config.freeze_language_model:
            # Freeze the base LM but let LoRA adapter leaves train
            # (reference stage-2: use_lora + frozen base, asr_modeling.py:96-131).
            dec_params = jax.tree_util.tree_map_with_path(
                lambda path, x: x if _is_lora_path(path) else jax.lax.stop_gradient(x),
                dec_params,
            )

        text_embeds = self.decoder.apply(
            {"params": dec_params}, input_ids, method=Qwen3Decoder.embed
        )
        audio_mask = input_ids == self.tokenizer.audio_token_id
        inputs_embeds = splice_audio(text_embeds, audio_mask, audio_embeds)

        positions = jnp.clip(jnp.cumsum(attn, axis=1) - 1, 0)
        logits, _ = self.decoder.apply(
            {"params": dec_params}, inputs_embeds, positions,
            padding_mask=attn,
        )

        # shift: predict token t+1 from position t
        shift_logits = logits[:, :-1].astype(jnp.float32)
        shift_labels = labels[:, 1:]
        valid = shift_labels != -100
        safe_labels = jnp.where(valid, shift_labels, 0)
        logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
        token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(valid.sum(), 1)
        ce = -(token_ll * valid).sum() / denom
        loss = ce + aux
        return loss, {"ce_loss": ce, "aux_loss": aux, "num_label_tokens": valid.sum()}

    # -------------------------------------------------------------- inference

    def _num_audio_tokens(self, mel_length: int) -> int:
        enc_len = compute_encoder_output_length(
            int(mel_length), self.config.encoder_conv_layers
        )
        return int(self.projector.get_output_length(enc_len))

    def _bucket_prompt_len(self, t_real: int, n_audio: int) -> int:
        """Padded prompt length: next PROMPT_BUCKET multiple, clamped to
        the full-encoder-window prompt length.  The clamp makes the top
        bucket exactly the full-window shape — the dominant production
        prompt (every 30 s serving clip and every longform chunk), which
        therefore pads ZERO rows, while near-full clips reuse its graph
        instead of spilling into a larger bucket."""
        t_max = t_real - n_audio + self._num_audio_tokens(
            self.mel_window_frames()
        )
        bucketed = -(-t_real // PROMPT_BUCKET) * PROMPT_BUCKET
        return max(min(bucketed, t_max), t_real)

    def build_prompt_ids(
        self,
        num_audio_tokens: int,
        user_prompt: Optional[str] = None,
        system_prompt: Optional[str] = None,
    ) -> list[int]:
        """Chat-templated prompt with N audio placeholders
        (reference asr_modeling.py:593-614)."""
        prompt = self.TRANSCRIBE_PROMPT if user_prompt is None else user_prompt
        user_content = AUDIO_TOKEN * num_audio_tokens
        if prompt:
            user_content += " " + prompt
        messages = []
        sp = self.system_prompt if system_prompt is None else system_prompt
        if sp:
            messages.append({"role": "system", "content": sp})
        messages.append({"role": "user", "content": user_content})
        ids = self.tokenizer.apply_chat_template(
            messages, tokenize=True, add_generation_prompt=True, enable_thinking=False
        )
        return list(map(int, ids))

    @functools.partial(jax.jit, static_argnames=("self",))
    def _splice_embeds_jit(self, params, input_features, audio_attention_mask,
                           input_ids):
        """Encoder + projector + prompt splice as ONE graph — the streaming
        prefill path must not run the 32-layer encoder eagerly (measured:
        op-by-op dispatch through the axon tunnel costs seconds)."""
        audio_embeds, _ = self._encode_audio(
            params, input_features, audio_attention_mask, train=False
        )
        text_embeds = self.decoder.apply(
            {"params": params["decoder"]}, input_ids, method=Qwen3Decoder.embed
        )
        audio_mask = input_ids == self.tokenizer.audio_token_id
        return splice_audio(text_embeds, audio_mask, audio_embeds)

    @functools.partial(
        jax.jit, static_argnames=("self", "gen", "fused_decode")
    )
    def _generate_jit(
        self,
        params,
        input_features,
        audio_attention_mask,
        input_ids,
        prompt_mask,
        gen: GenerationConfig,
        fused_decode: bool = False,
        prompt_len=None,
        wq=None,
    ):
        audio_embeds, _ = self._encode_audio(
            params, input_features, audio_attention_mask, train=False
        )
        text_embeds = self.decoder.apply(
            {"params": params["decoder"]}, input_ids, method=Qwen3Decoder.embed
        )
        audio_mask = (input_ids == self.tokenizer.audio_token_id) & prompt_mask.astype(bool)
        inputs_embeds = splice_audio(text_embeds, audio_mask, audio_embeds)
        if gen.num_beams > 1:
            # beams keep full precision (exact path; wq is greedy-serving)
            return generate_beams(
                self.decoder, {"params": params["decoder"]}, inputs_embeds,
                gen, input_ids=input_ids,
            )
        dec_vars = {"params": params["decoder"]}
        if wq is not None:
            dec_vars["wq"] = wq
        return generate_tokens(
            self.decoder, dec_vars,
            inputs_embeds, input_ids, gen, fused_decode=fused_decode,
            prompt_len=prompt_len,
        )

    def generate(
        self,
        input_features,
        audio_attention_mask,
        user_prompt: Optional[str] = None,
        system_prompt: Optional[str] = None,
        mel_length: Optional[int] = None,
        **overrides,
    ) -> np.ndarray:
        """Transcribe a batch.  Returns generated token ids [B, max_new]
        (pad after EOS), prompt already stripped.  With
        ``return_scores=True`` (a GenerationConfig override), returns
        ``(tokens, scores)`` where scores[B] is the mean log-probability of
        the chosen tokens under the raw model distribution — ``exp()`` is a
        (0, 1] per-utterance confidence (greedy/sampling paths only).

        ``mel_length``: batch-max real mel frames when the caller already
        knows it (the processor does) — skips a device->host sync of the
        mask sum on the hot path."""
        input_features = jnp.asarray(input_features)
        audio_attention_mask = jnp.asarray(audio_attention_mask)
        b = input_features.shape[0]

        real_mel = (
            int(mel_length)
            if mel_length is not None
            else int(np.asarray(audio_attention_mask).sum(axis=-1).max())
        )
        n_audio = self._num_audio_tokens(real_mel)
        ids = self.build_prompt_ids(n_audio, user_prompt, system_prompt)

        gen = self.gen_config
        if overrides:
            import dataclasses as _dc

            gen = _dc.replace(gen, **overrides)
        if gen.return_scores and gen.num_beams > 1:
            raise ValueError(
                "return_scores supports the greedy/sampling decode paths; "
                "beam search carries its own hypothesis scores"
            )

        # Right-pad the prompt to a static PROMPT_BUCKET multiple so the
        # generate graph is keyed on the bucket, not the exact token count
        # — the audio-token count tracks REAL mel length (an exact-parity
        # contract), so without this every distinct clip duration compiles
        # its own prefill+decode graph (~80 ms of audio per distinct
        # count; serving mixed-duration traffic recompiled constantly).
        # Token-exact: pad rows are causally invisible (generation.py
        # generate_tokens docstring).  Beams keep exact prompts (rare
        # path; generate_beams has no prompt_len plumbing).
        t_real = len(ids)
        t_pad = (t_real if gen.num_beams > 1
                 else self._bucket_prompt_len(t_real, n_audio))
        ids_np = np.full((b, t_pad), gen.pad_token_id, np.int32)
        ids_np[:, :t_real] = ids
        input_ids = jnp.asarray(ids_np)
        prompt_mask = jnp.asarray(
            np.broadcast_to(np.arange(t_pad) < t_real, (b, t_pad)).astype(np.int32)
        )

        # Resolve the fused-decode env OUTSIDE the jit: _generate_jit's
        # cache is keyed on this static flag, so flipping TA_PALLAS_DECODE
        # mid-process retraces instead of silently reusing the first trace.
        from tiny_audio_tpu.generation import _fused_decode_available

        out = self._generate_jit(
            self.params, input_features, audio_attention_mask,
            input_ids, prompt_mask, gen,
            # wq reads params through its own kernel; the fused decode loop
            # reads the bf16 params directly — mutually exclusive opt-ins
            fused_decode=(self.wq is None
                          and _fused_decode_available(self.decoder)),
            prompt_len=jnp.int32(t_real),
            wq=self.wq,
        )
        if gen.return_scores:
            tokens, _, scores = out
            return np.asarray(tokens), np.asarray(scores)
        tokens, _ = out
        return np.asarray(tokens)

    def mel_window_frames(self) -> int:
        """Max mel frames one encoder pass accepts (post-conv positions x
        total conv stride; 3000 for the 30 s flagship window)."""
        stride = 1
        for _, _, s in self.config.encoder_conv_layers:
            stride *= s
        return self.config.encoder.max_source_positions * stride

    def generate_streaming(
        self,
        input_features,
        audio_attention_mask,
        user_prompt: Optional[str] = None,
        system_prompt: Optional[str] = None,
    ):
        """Yield decoded text fragments token-by-token, filtering <think>
        blocks (reference asr_modeling.py:648-767).

        Accepts arbitrary-length features: inputs longer than the encoder
        window are streamed chunk-by-chunk (30 s windows re-primed with a
        fresh prompt, the voice-agent long-form path — reference chunking
        hooks asr_pipeline.py:204-207), yielding live partials across the
        whole file.  Mel is computed once over the full audio and sliced
        per window (STFT is hop-local, so slicing == per-chunk extraction
        up to one window of boundary effect).
        """
        input_features = jnp.asarray(input_features)
        audio_attention_mask = jnp.asarray(audio_attention_mask)
        assert input_features.shape[0] == 1

        window = self.mel_window_frames()
        n_frames_total = int(input_features.shape[-1])
        if n_frames_total > window:
            mask_np = np.asarray(audio_attention_mask)
            yielded_before = False
            for s in range(0, n_frames_total, window):
                if int(mask_np[:, s:s + window].sum()) == 0:
                    continue  # fully padded tail window
                first_of_chunk = True
                for frag in self.generate_streaming(
                    input_features[:, :, s:s + window],
                    audio_attention_mask[:, s:s + window],
                    user_prompt, system_prompt,
                ):
                    if (first_of_chunk and yielded_before and frag
                            and not frag[0].isspace()):
                        frag = " " + frag
                    first_of_chunk = False
                    yielded_before = yielded_before or bool(frag)
                    yield frag
            return

        real_mel = int(np.asarray(audio_attention_mask).sum(axis=-1).max())
        n_audio = self._num_audio_tokens(real_mel)
        ids = self.build_prompt_ids(n_audio, user_prompt, system_prompt)
        # bucketed prompt (see PROMPT_BUCKET / generate): one prefill graph
        # per bucket instead of one per distinct utterance duration — the
        # realtime server's partials hit a new duration every call
        t_real = len(ids)
        t_pad = self._bucket_prompt_len(t_real, n_audio)
        ids_np = np.full((1, t_pad), self.gen_config.pad_token_id, np.int32)
        ids_np[0, :t_real] = ids
        input_ids = jnp.asarray(ids_np)

        inputs_embeds = self._splice_embeds_jit(
            self.params, input_features, audio_attention_mask, input_ids
        )

        def decoded_chunks():
            pending: list[int] = []
            for tok in stream_generate(
                self.decoder, self.decoder_variables(),
                inputs_embeds, input_ids, self.gen_config,
                prompt_len=t_real,
            ):
                pending.append(tok)
                text = self.tokenizer.decode(pending, skip_special_tokens=True)
                if text:
                    pending = []
                    yield text

        yield from filter_think_stream(decoded_chunks())

    # ------------------------------------------------------------ persistence

    def save_pretrained(self, save_directory, save_towers: bool = True) -> None:
        """Checkpoint contract: config.json + projector.msgpack (trainable
        state, mirroring the reference's projector-only ``state_dict``,
        asr_modeling.py:398-422) + optional tower weights for
        self-containment."""
        save_dir = Path(save_directory)
        save_dir.mkdir(parents=True, exist_ok=True)
        self.config.save_pretrained(save_dir)
        (save_dir / "projector.msgpack").write_bytes(
            serialization.to_bytes(self.params["projector"])
        )
        dec_base, dec_lora = split_lora(self.params["decoder"])
        if dec_lora:
            (save_dir / "adapter.msgpack").write_bytes(
                serialization.to_bytes(dec_lora)
            )
        if not self.config.freeze_language_model:
            (save_dir / "decoder.msgpack").write_bytes(
                serialization.to_bytes(dec_base)
            )
        if save_towers:
            (save_dir / "towers.msgpack").write_bytes(
                serialization.to_bytes(
                    {"encoder": self.params["encoder"], "decoder": dec_base}
                )
            )
        meta = {"framework": "tiny_audio_tpu", "format": "flax-msgpack"}
        (save_dir / "tpu_metadata.json").write_text(json.dumps(meta, indent=2))

    @classmethod
    def from_pretrained(cls, path, tokenizer=None, **kwargs) -> "ASRModel":
        path = Path(path)
        config = ASRConfig.from_pretrained(path)
        if tokenizer is None and (path / "tokenizer_config.json").exists():
            tokenizer = HFTokenizerAdapter.from_pretrained(str(path))
        model = cls(config, tokenizer=tokenizer, **kwargs)
        dec_base, dec_lora = split_lora(model.params["decoder"])
        if (path / "towers.msgpack").exists():
            towers = serialization.from_bytes(
                {"encoder": model.params["encoder"], "decoder": dec_base},
                (path / "towers.msgpack").read_bytes(),
            )
            model.params["encoder"] = towers["encoder"]
            dec_base = towers["decoder"]
        if (path / "decoder.msgpack").exists():
            dec_base = serialization.from_bytes(
                dec_base, (path / "decoder.msgpack").read_bytes()
            )
        if dec_lora and (path / "adapter.msgpack").exists():
            dec_lora = serialization.from_bytes(
                dec_lora, (path / "adapter.msgpack").read_bytes()
            )
        model.params["decoder"] = merge_lora(dec_base, dec_lora)
        if (path / "projector.msgpack").exists():
            model.params["projector"] = serialization.from_bytes(
                model.params["projector"], (path / "projector.msgpack").read_bytes()
            )
        cls._attach_aux_towers(path)
        return model

    @staticmethod
    def _attach_aux_towers(path: Path) -> None:
        """Attach checkpoint-local aligner / speaker-embedder weights to
        their process singletons.  ``convert_checkpoint`` writes
        ``wav2vec2_aligner.msgpack`` / ``ecapa_embedder.msgpack`` into the
        artifact and attaches in-process — but a FRESH serving process
        (handler, realtime, eval) only runs ``from_pretrained``, so
        without this hook timestamps silently fell back to uniform-spread
        words and diarization to the synthetic embedder tier."""
        aligner = path / "wav2vec2_aligner.msgpack"
        if aligner.exists():
            from tiny_audio_tpu.alignment import ForcedAligner

            if not ForcedAligner.has_model():
                try:
                    ForcedAligner.load_weights(aligner)
                except Exception as e:  # keep serving up on a bad aux file
                    print(f"[asr] aligner weights unusable ({e}); "
                          "word timestamps will use the uniform fallback")
        ecapa = path / "ecapa_embedder.msgpack"
        if ecapa.exists():
            from tiny_audio_tpu.diarization import EcapaEmbedder

            if (EcapaEmbedder._instance is None
                    or EcapaEmbedder._instance.tier != "speechbrain"):
                try:
                    EcapaEmbedder._instance = EcapaEmbedder.from_converted(
                        ecapa
                    )
                except Exception as e:
                    print(f"[asr] ecapa weights unusable ({e}); "
                          "diarization keeps the synthetic tier")
