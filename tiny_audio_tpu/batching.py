"""Dynamic request batching for serving.

The serving measurement (docs/performance.md): one chip decodes batch 48 at
~755 RTFx, but a lock-serialized batch-1 server tops out near 1/p50 ≈ 3
requests/s.  Decode is weight-read-bound, so requests that arrive together
should share ONE pass over the decoder weights.  :class:`DynamicBatcher`
coalesces concurrent short-clip requests into one
:meth:`~tiny_audio_tpu.pipeline.ASRPipeline.transcribe_batch` call:

- a dispatcher thread takes the first queued request, then waits up to
  ``max_wait_ms`` for more (bounded by ``max_batch``);
- requests are grouped by ``user_prompt`` (different prompts produce
  different chat templates and must not share a generate call);
- the batch row count is padded to a power of 2 inside ``transcribe_batch``,
  so only log2(max_batch)+1 generate shapes exist per mel bucket.

The reference has no serving batcher (single-request HF endpoint handler,
``/root/reference/tiny_audio/handler.py``); this is TPU-serving-specific
throughput machinery.

Latency trade: a lone request pays at most ``max_wait_ms`` extra (default
20 ms against a ~300 ms utterance latency); under load, throughput scales
with the coalesced batch instead of the request rate.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional


class DynamicBatcher:
    def __init__(
        self,
        pipe,
        max_batch: int = 16,
        max_wait_ms: float = 20.0,
        lock: Optional[threading.Lock] = None,
    ):
        self.pipe = pipe
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        # shared with the solo serving path so batched and solo graphs never
        # run concurrently (both are sized near the chip's HBM budget)
        self.lock = lock or threading.Lock()
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------- API

    def submit(self, audio, user_prompt: Optional[str] = None) -> Future:
        """Enqueue one short-clip request; resolves to the transcript str."""
        fut: Future = Future()
        self._q.put((audio, user_prompt, fut))
        return fut

    def close(self) -> None:
        self._stop = True
        self._q.put(None)  # wake the dispatcher
        self._thread.join(timeout=10)

    # -------------------------------------------------------------- dispatch

    def _collect(self) -> list:
        """Block for the first request, then coalesce for up to max_wait_s."""
        first = self._q.get()
        if first is None:
            return []
        group = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(group) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            group.append(item)
        return group

    def _dispatch_loop(self) -> None:
        while not self._stop:
            group = self._collect()
            if not group:
                continue
            by_prompt: dict = {}
            for audio, prompt, fut in group:
                by_prompt.setdefault(prompt, []).append((audio, fut))
            for prompt, items in by_prompt.items():
                futs = [f for _, f in items]
                try:
                    with self.lock:
                        texts = self.pipe.transcribe_batch(
                            [a for a, _ in items], user_prompt=prompt
                        )
                    for f, text in zip(futs, texts):
                        f.set_result(text)
                except BaseException as e:  # one bad batch must not wedge callers
                    for f in futs:
                        if not f.done():
                            f.set_exception(e)
