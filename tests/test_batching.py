"""Dynamic serving batcher: coalescing, prompt isolation, error propagation,
and the HTTP integration (stub pipeline — no TPU)."""

import threading
import time

import numpy as np
import pytest

from tiny_audio_tpu.batching import DynamicBatcher


class StubPipe:
    """Records transcribe_batch calls; transcript encodes row identity."""

    MAX_CHUNK_SECONDS = 30.0

    def __init__(self, delay_s: float = 0.0, fail_prompt=None):
        self.calls: list[tuple[int, object]] = []
        self.delay_s = delay_s
        self.fail_prompt = fail_prompt
        self._lock = threading.Lock()

    def extract_audio(self, inputs):
        if isinstance(inputs, bytes):
            arr = np.frombuffer(inputs, np.float32)
        else:
            arr = np.asarray(inputs, np.float32)
        return {"array": arr, "sampling_rate": 16000}

    def transcribe_batch(self, audios, user_prompt=None):
        with self._lock:
            self.calls.append((len(audios), user_prompt))
        if self.fail_prompt is not None and user_prompt == self.fail_prompt:
            raise RuntimeError("boom")
        if self.delay_s:
            time.sleep(self.delay_s)
        return [f"len{len(a)}" for a in audios]


def test_single_request_passes_through():
    pipe = StubPipe()
    b = DynamicBatcher(pipe, max_batch=8, max_wait_ms=5)
    try:
        fut = b.submit(np.zeros(160, np.float32))
        assert fut.result(timeout=5) == "len160"
        assert pipe.calls == [(1, None)]
    finally:
        b.close()


def test_concurrent_requests_coalesce():
    pipe = StubPipe()
    b = DynamicBatcher(pipe, max_batch=8, max_wait_ms=80)
    try:
        futs = [
            b.submit(np.zeros(100 + i, np.float32)) for i in range(6)
        ]
        texts = [f.result(timeout=5) for f in futs]
        assert texts == [f"len{100 + i}" for i in range(6)]
        # all six landed in well under max_wait -> fewer calls than requests
        assert sum(n for n, _ in pipe.calls) == 6
        assert len(pipe.calls) < 6
        assert max(n for n, _ in pipe.calls) > 1
    finally:
        b.close()


def test_prompts_are_isolated():
    pipe = StubPipe()
    b = DynamicBatcher(pipe, max_batch=8, max_wait_ms=80)
    try:
        f1 = b.submit(np.zeros(10, np.float32), user_prompt=None)
        f2 = b.submit(np.zeros(20, np.float32), user_prompt="translate")
        f3 = b.submit(np.zeros(30, np.float32), user_prompt=None)
        assert f1.result(5) == "len10"
        assert f2.result(5) == "len20"
        assert f3.result(5) == "len30"
        prompts = sorted((p for _, p in pipe.calls), key=str)
        assert prompts == [None, "translate"]
    finally:
        b.close()


def test_failed_batch_propagates_to_all_futures():
    pipe = StubPipe(fail_prompt="bad")
    b = DynamicBatcher(pipe, max_batch=8, max_wait_ms=60)
    try:
        good = b.submit(np.zeros(10, np.float32))
        bad1 = b.submit(np.zeros(20, np.float32), user_prompt="bad")
        bad2 = b.submit(np.zeros(30, np.float32), user_prompt="bad")
        assert good.result(5) == "len10"
        with pytest.raises(RuntimeError, match="boom"):
            bad1.result(5)
        with pytest.raises(RuntimeError, match="boom"):
            bad2.result(5)
    finally:
        b.close()


def test_max_batch_respected():
    pipe = StubPipe()
    b = DynamicBatcher(pipe, max_batch=4, max_wait_ms=80)
    try:
        futs = [b.submit(np.zeros(10, np.float32)) for _ in range(9)]
        for f in futs:
            f.result(5)
        assert all(n <= 4 for n, _ in pipe.calls)
    finally:
        b.close()


def test_close_is_idempotent_and_stops_thread():
    b = DynamicBatcher(StubPipe(), max_batch=4, max_wait_ms=5)
    b.close()
    assert not b._thread.is_alive()


class TestServerIntegration:
    def _serve(self, pipe, batcher):
        from tiny_audio_tpu.serving import make_server

        handler = lambda req: {"text": "solo"}  # noqa: E731
        server = make_server(handler, host="127.0.0.1", port=0,
                             batcher=batcher)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server

    def test_batched_route_and_solo_fallback(self):
        import urllib.request

        pipe = StubPipe()
        batcher = DynamicBatcher(pipe, max_batch=8, max_wait_ms=30)
        server = self._serve(pipe, batcher)
        try:
            port = server.server_address[1]
            body = np.zeros(160, np.float32).tobytes()

            def post(path):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}", data=body,
                    headers={"Content-Type": "application/pcm-f32"},
                )
                import json

                with urllib.request.urlopen(req, timeout=10) as r:
                    return json.loads(r.read())

            # short plain clip -> batched path (stub transcript)
            assert post("/transcribe") == {"text": "len160"}
            # timestamps -> solo handler path
            assert post("/transcribe?timestamps=1") == {"text": "solo"}
            assert pipe.calls and pipe.calls[0][0] >= 1
        finally:
            server.shutdown()
            batcher.close()


def test_backlog_full_rejects():
    """submit raises BacklogFull once max_queue requests are pending
    (overload backpressure -> HTTP 503, not 600 s timeouts)."""
    from tiny_audio_tpu.batching import BacklogFull

    pipe = StubPipe(delay_s=0.5)
    b = DynamicBatcher(pipe, max_batch=1, max_wait_ms=1, max_queue=3)
    try:
        b.submit(np.zeros(8, np.float32))  # occupies the dispatcher
        time.sleep(0.05)
        for _ in range(3):
            b.submit(np.zeros(8, np.float32))
        with pytest.raises(BacklogFull):
            b.submit(np.zeros(8, np.float32))
    finally:
        b.close()


def test_close_fails_queued_futures():
    """close() must resolve still-queued futures so HTTP threads blocked in
    result() do not hang through shutdown (ADVICE r2)."""
    pipe = StubPipe(delay_s=0.4)
    b = DynamicBatcher(pipe, max_batch=1, max_wait_ms=1)
    b.submit(np.zeros(8, np.float32))  # in-flight
    time.sleep(0.05)
    queued = [b.submit(np.zeros(8, np.float32)) for _ in range(4)]
    b.close()
    for fut in queued:
        if fut.done() and fut.exception() is None:
            continue  # dispatched before the stop flag landed
        with pytest.raises(RuntimeError):
            fut.result(timeout=1)
