"""Continuous (slot-based) batching: requests join the decode loop mid-flight.

The dynamic batcher (:mod:`tiny_audio_tpu.batching`) coalesces arrivals into
uniform batches, but a uniform batch decodes until its SLOWEST row finishes
(``generate_tokens`` early-exits only on all-finished), and a request that
arrives mid-batch waits a full batch latency.  This engine keeps N persistent
decode slots over one KV cache; each slot sits at its own sequence length:

- arriving requests are prefilled (encoder + prompt, existing bucketed
  graphs) and scattered into free slots (``generation.insert_slots``);
- one jitted chunk of ``chunk_steps`` greedy steps advances ALL slots
  (``generation.decode_chunk``) with per-row positions / per-row KV-cache
  scatter writes (``models/decoder.py`` array ``cache_index``);
- after each chunk the host drains tokens, resolves finished slots'
  futures, and admits queued work into the freed slots.

A finished row wastes at most ``chunk_steps - 1`` decode steps; a new
request waits at most one chunk (~chunk_steps × ~4 ms) plus its prefill
instead of a full batch decode (~500 ms).

Scope: the serving DEFAULT decode only — greedy, no repetition penalty /
ngram ban / sampling / beams (``ASRConfig`` generation defaults match the
reference's, asr_config.py:107-109).  Non-default generate kwargs take the
:class:`~tiny_audio_tpu.batching.DynamicBatcher` path instead.  The
reference has no serving engine at all (single-request handler,
/root/reference/tiny_audio/handler.py:55-71); this is TPU-native serving
machinery in the vein of slot-based TPU LLM servers.

Termination note: a slot's output ends at the first EOS **or pad** token —
with the default tokenizer pad IS an EOS id; for tokenizers where it is
not, a genuinely generated pad token still terminates the slot (the
uniform path's postprocess drops pad tokens from the text anyway).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tiny_audio_tpu.batching import BacklogFull
from tiny_audio_tpu.generation import (
    decode_chunk,
    init_slot_state,
    insert_slots,
    prefill_prompt_cache,
)


class ContinuousEngine:
    #: admitted-prefill row buckets (power-of-2 pad like transcribe_batch)
    PREFILL_BUCKETS = (1, 2, 4, 8)

    def __init__(
        self,
        pipe,
        n_slots: int = 16,
        chunk_steps: int = 8,
        lock: Optional[threading.Lock] = None,
        max_queue: Optional[int] = None,
        start: bool = True,
    ):
        model = pipe.model
        gen = model.gen_config
        if (
            gen.num_beams > 1
            or gen.repetition_penalty != 1.0
            or gen.no_repeat_ngram_size != 0
            or gen.do_sample
            or gen.min_new_tokens > 0
        ):
            raise ValueError(
                "ContinuousEngine supports the greedy serving default only "
                "(no beams/penalty/ngram/sampling/min_new_tokens); use "
                "DynamicBatcher for non-default generation configs"
            )
        self.pipe = pipe
        self.model = model
        self.gen = gen
        self.n_slots = int(n_slots)
        self.chunk_steps = int(chunk_steps)
        self.max_queue = (
            int(max_queue) if max_queue is not None else 8 * self.n_slots
        )
        self.lock = lock or threading.Lock()
        self._eos = set(gen.eos_token_ids) | {gen.pad_token_id}

        # widest prompt: largest mel bucket -> most audio tokens
        max_prompt = len(
            model.build_prompt_ids(
                model._num_audio_tokens(model.mel_window_frames())
            )
        )
        self.s_max = -(-(max_prompt + gen.max_new_tokens + 1) // 16) * 16
        self._state = init_slot_state(
            model.decoder, self.n_slots, self.s_max, gen.pad_token_id
        )
        # host-side per-slot bookkeeping: None = free
        self._slots: list[Optional[dict]] = [None] * self.n_slots
        self._free: list[int] = list(range(self.n_slots))

        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self._thread = threading.Thread(target=self._drive, daemon=True)
        if start:  # tests drive _admit/_prefill_and_insert/_decode_one_chunk
            self._thread.start()

    # ------------------------------------------------------------------- API

    def start(self) -> None:
        """Start the driver thread (idempotent).  ``serve`` constructs the
        engine with ``start=False``, warms up, then starts — warmup mutates
        slot state and must not race the driver."""
        if self._thread.ident is None and not self._stop:
            self._thread.start()

    def warmup(self, log=print, buckets=None) -> float:
        """AOT-compile the engine's graph grid: (mel bucket × prefill
        bucket) prefill+insert shapes plus the decode chunk.  Call BEFORE
        :meth:`start` — a cold shape at request time stalls every slot
        behind a minutes-long compile.  ``buckets``: optional subset of mel
        bucket frame-counts to warm (benches serving one clip shape need
        not compile all six).  Returns total seconds."""
        import time as _time

        from tiny_audio_tpu.ops import mel as _mel

        t_all = _time.time()
        proc = self.pipe.processor
        prev = 0
        for bi, frames in enumerate(proc.mel_buckets):
            if buckets is not None and frames not in buckets:
                prev = frames
                continue
            # Both ends of each mel bucket, like handler.warmup: the
            # splice/prefill/insert graphs are keyed on the PROMPT_BUCKET
            # the real audio-token count falls in, and a mel bucket's
            # token range spans at most two prompt buckets.
            lengths = sorted({(prev + 1) * _mel.HOP_LENGTH,
                              frames * _mel.HOP_LENGTH})
            prev = frames
            for n in lengths:
                clip = np.zeros(n, np.float32)
                for b in self.PREFILL_BUCKETS:
                    if b > self.n_slots:
                        continue
                    t0 = _time.time()
                    reqs = [
                        {"audio": clip, "prompt": None, "future": Future()}
                        for _ in range(b)
                    ]
                    self._prefill_group(None, reqs)
                    if self._active():  # also compiles the decode chunk graph
                        self._decode_one_chunk()
                    for sid, slot in enumerate(self._slots):
                        if slot is not None:
                            slot["future"].cancel()
                            self._release(sid)
                    log(f"[engine-warmup] mel bucket {bi} ({frames}f, "
                        f"{n / 16000:.1f}s) x b{b}: "
                        f"{_time.time() - t0:.1f}s")
        total = _time.time() - t_all
        log(f"[engine-warmup] total {total:.1f}s "
            f"({len(proc.mel_buckets)} mel buckets x 2 ends x "
            f"{len(self.PREFILL_BUCKETS)} prefill shapes + decode chunk)")
        return total

    def submit(self, audio, user_prompt: Optional[str] = None) -> Future:
        """Enqueue one short clip; the Future resolves to the transcript.

        Raises after :meth:`close` — same contract as
        :meth:`DynamicBatcher.submit`: a put racing past the close-time
        drain must not leave its Future unresolved (the realtime server
        blocks in ``result(timeout=300)`` on it)."""
        if self._stop:
            raise RuntimeError("ContinuousEngine is closed")
        if self._q.qsize() >= self.max_queue:
            raise BacklogFull(f"request queue full ({self.max_queue} pending)")
        fut: Future = Future()
        limit = int(self.pipe.MAX_CHUNK_SECONDS * 16000)
        arr = self.pipe.extract_audio(audio)["array"]
        if len(arr) > limit:
            raise ValueError(
                f"ContinuousEngine takes clips <= {self.pipe.MAX_CHUNK_SECONDS}"
                " s; route long-form inputs through the pipeline"
            )
        self._q.put({"audio": arr, "prompt": user_prompt, "future": fut})
        if self._stop:  # raced close(): its drain may have missed this put
            self._drain_pending()
        return fut

    def pending(self) -> int:
        """Requests waiting for a slot (approximate) — the realtime server
        probes this to emit partials only on an idle queue (same duck-type
        as :meth:`DynamicBatcher.pending`)."""
        return self._q.qsize()

    def close(self) -> None:
        self._stop = True
        self._q.put(None)
        if self._thread.ident is not None:  # never started in manual mode
            self._thread.join(timeout=30)
        for slot in self._slots:
            if slot is not None and not slot["future"].done():
                slot["future"].set_exception(
                    RuntimeError("ContinuousEngine closed mid-decode")
                )
        self._drain_pending()

    def _drain_pending(self) -> None:
        """Fail still-queued requests; called from close() and from a
        submit() that raced past it."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item["future"].done():
                item["future"].set_exception(
                    RuntimeError("ContinuousEngine closed before dispatch")
                )

    # ---------------------------------------------------------------- driver

    def _active(self) -> bool:
        return any(s is not None for s in self._slots)

    def _drive(self) -> None:
        while not self._stop:
            admitted = self._admit()
            if admitted:
                try:
                    self._prefill_and_insert(admitted)
                except BaseException as e:  # noqa: BLE001 — resolve futures
                    for req in admitted:
                        if not req["future"].done():
                            req["future"].set_exception(e)
            if self._active():
                try:
                    self._decode_one_chunk()
                except BaseException as e:  # noqa: BLE001
                    for sid, slot in enumerate(self._slots):
                        if slot is not None:
                            if not slot["future"].done():
                                slot["future"].set_exception(e)
                            self._release(sid)

    def _admit(self) -> list[dict]:
        """Pull queued requests into free slots.  Blocks briefly only when
        the engine is otherwise idle."""
        admitted: list[dict] = []
        block = not self._active()
        while len(admitted) < len(self._free):
            try:
                item = self._q.get(timeout=0.05 if block and not admitted else 0)
            except queue.Empty:
                break
            if item is None:
                break
            admitted.append(item)
            block = False
        return admitted

    def _prefill_and_insert(self, admitted: list[dict]) -> None:
        """Prefill admitted requests (grouped by user_prompt — different
        prompts produce different chat templates) and scatter into slots.

        Groups are decomposed into exact PREFILL_BUCKETS sizes (5 -> 4+1)
        so every prefill/insert graph shape is enumerable and warmup can
        AOT-compile the full grid — an odd group size at request time must
        never hit a cold compile."""
        by_prompt: dict = {}
        for req in admitted:
            by_prompt.setdefault(req["prompt"], []).append(req)
        for prompt, reqs in by_prompt.items():
            i = 0
            while i < len(reqs):
                size = next(
                    b for b in reversed(self.PREFILL_BUCKETS)
                    if b <= len(reqs) - i
                )
                self._prefill_group(prompt, reqs[i : i + size])
                i += size

    def _prefill_group(self, prompt: Optional[str], reqs: list[dict]) -> None:
        model = self.model
        n_real = len(reqs)
        assert n_real in self.PREFILL_BUCKETS, n_real  # decomposed upstream
        arrays = [r["audio"] for r in reqs]
        feats = self.pipe.processor.extract_features(arrays)
        mel_len = int(np.max(feats["mel_lengths"]))
        n_audio = model._num_audio_tokens(mel_len)
        ids = model.build_prompt_ids(n_audio, prompt)
        # Right-pad to the PROMPT_BUCKET multiple (same contract as
        # ASRModel.generate): the audio-token count tracks REAL mel length,
        # so without bucketing every ~80 ms of clip duration is a distinct
        # prompt length — a cold splice/prefill/insert compile at request
        # time, inside the shared lock.  Pad rows are causally invisible in
        # prefill; insert_slots records the REAL length, so decode resumes
        # at t_real and the garbage cache rows >= t_real stay kv-masked
        # until overwritten (decode_chunk kv_valid).
        t_real = len(ids)
        t_pad = model._bucket_prompt_len(t_real, n_audio)
        ids_np = np.full((t_pad,), self.gen.pad_token_id, np.int32)
        ids_np[:t_real] = ids
        input_ids = jnp.asarray(np.tile(ids_np, (n_real, 1)))
        # Allocate slots up front but commit only on success: popping
        # inside the device block leaked slots permanently when a
        # prefill/insert raised (pool shrinks until _admit deadlocks).
        slot_ids = self._free[-n_real:]
        assert len(slot_ids) == n_real, "admitted more than free slots"
        with self.lock:
            embeds = model._splice_embeds_jit(
                model.params,
                jnp.asarray(feats["input_features"]),
                jnp.asarray(feats["audio_attention_mask"]),
                input_ids,
            )
            tok0, pcache = prefill_prompt_cache(
                model.decoder, model.decoder_variables(), embeds,
                jnp.int32(t_real),
            )
            tok0 = np.asarray(tok0)

            first_finished = np.array(
                [
                    int(tok0[i]) in self._eos or self.gen.max_new_tokens <= 1
                    for i in range(n_real)
                ]
            )
            self._state = insert_slots(
                self._state,
                pcache,
                jnp.asarray(tok0, jnp.int32),
                jnp.asarray(np.array(slot_ids, np.int32)),
                jnp.full((n_real,), t_real, jnp.int32),
                jnp.asarray(first_finished),
            )
        del self._free[-n_real:]  # commit the allocation
        for i, (req, sid) in enumerate(zip(reqs, slot_ids)):
            slot = {
                "future": req["future"],
                "tokens": [int(tok0[i])],
                "done": False,
            }
            if first_finished[i]:
                # finished at prefill: resolve now, slot never decodes
                self._finish(slot)
                self._free.append(sid)
            else:
                self._slots[sid] = slot

    def _decode_one_chunk(self) -> None:
        with self.lock:
            self._state, toks = decode_chunk(
                self.model.decoder,
                self.model.decoder_variables(),
                self._state,
                self.gen,
                self.chunk_steps,
            )
            toks = np.asarray(toks)
        for sid, slot in enumerate(self._slots):
            if slot is None:
                continue
            for t in toks[sid]:
                t = int(t)
                if t in self._eos:
                    slot["done"] = True
                    break
                slot["tokens"].append(t)
                if len(slot["tokens"]) >= self.gen.max_new_tokens:
                    slot["done"] = True
                    break
            if slot["done"]:
                self._finish(slot)
                self._release(sid)

    def _finish(self, slot: dict) -> None:
        slot["done"] = True
        if not slot["future"].done():
            text = self.pipe.postprocess_tokens(slot["tokens"])
            slot["future"].set_result(text)

    def _release(self, sid: int) -> None:
        self._slots[sid] = None
        self._free.append(sid)
