"""Continuous (slot-based) batching engine: token-exact parity with the
uniform-batch path, mid-flight joins, slot reuse, backpressure.

The gold property: greedy decode is deterministic, so for any arrival
pattern the engine's transcript must EQUAL ``pipe.transcribe_batch`` /
solo ``pipe()`` on the same audio (same prefill bucket semantics)."""

import numpy as np
import pytest

from tiny_audio_tpu.batching import BacklogFull
from tiny_audio_tpu.pipeline import ASRPipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.processing import ASRProcessor

    cfg = tiny_test_config()
    cfg.model_dtype = "float32"
    cfg.max_new_tokens = 8
    model = ASRModel(cfg, seed=0)
    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=cfg.encoder.num_mel_bins, mel_buckets=(100,),
    )
    return ASRPipeline(model, proc)


def _clip(seed: int, n: int = 12000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _engine(tiny_pipe, **kw):
    from tiny_audio_tpu.continuous import ContinuousEngine

    kw.setdefault("n_slots", 4)
    kw.setdefault("chunk_steps", 3)
    return ContinuousEngine(tiny_pipe, start=False, **kw)


def _run_until_done(eng, futures, max_rounds=50):
    for _ in range(max_rounds):
        admitted = eng._admit()
        if admitted:
            eng._prefill_and_insert(admitted)
        if eng._active():
            eng._decode_one_chunk()
        if all(f.done() for f in futures):
            return
    raise AssertionError("engine did not finish")


class TestParity:
    def test_solo_matches_batch_path(self, tiny_pipe):
        audio = _clip(1)
        want = tiny_pipe.transcribe_batch([audio])[0]
        eng = _engine(tiny_pipe)
        fut = eng.submit(audio)
        _run_until_done(eng, [fut])
        assert fut.result(timeout=5) == want

    def test_coalesced_matches_batch_path(self, tiny_pipe):
        audios = [_clip(s, n) for s, n in ((2, 12000), (3, 9000), (4, 15000))]
        want = tiny_pipe.transcribe_batch(audios)
        eng = _engine(tiny_pipe)
        futs = [eng.submit(a) for a in audios]
        _run_until_done(eng, futs)
        got = [f.result(timeout=5) for f in futs]
        # same prefill group -> identical batch-max token semantics
        assert got == want

    def test_staggered_join_mid_decode(self, tiny_pipe):
        """A request joining after chunks have run must decode exactly as a
        fresh solo request — slots are independent."""
        a, b = _clip(5), _clip(6, 10000)
        want_a = tiny_pipe.transcribe_batch([a])[0]
        want_b = tiny_pipe.transcribe_batch([b])[0]
        eng = _engine(tiny_pipe)
        fut_a = eng.submit(a)
        adm = eng._admit()
        assert len(adm) == 1
        eng._prefill_and_insert(adm)
        eng._decode_one_chunk()  # a is mid-flight
        fut_b = eng.submit(b)
        _run_until_done(eng, [fut_a, fut_b])
        assert fut_a.result(timeout=5) == want_a
        assert fut_b.result(timeout=5) == want_b

    def test_slot_reuse_after_finish(self, tiny_pipe):
        """More requests than slots: finished slots must be reused and later
        requests still decode correctly (stale cache fully overwritten)."""
        audios = [_clip(10 + i, 8000 + 1000 * i) for i in range(5)]
        want = [tiny_pipe.transcribe_batch([a])[0] for a in audios]
        eng = _engine(tiny_pipe, n_slots=2)
        futs = [eng.submit(a) for a in audios]
        _run_until_done(eng, futs, max_rounds=200)
        got = [f.result(timeout=5) for f in futs]
        assert got == want


class TestLifecycle:
    def test_backpressure(self, tiny_pipe):
        eng = _engine(tiny_pipe, max_queue=1)
        eng.submit(_clip(20))
        with pytest.raises(BacklogFull):
            eng.submit(_clip(21))

    def test_long_clip_rejected(self, tiny_pipe):
        eng = _engine(tiny_pipe)
        with pytest.raises(ValueError, match="clips <="):
            eng.submit(np.zeros(16000 * 60, np.float32))

    def test_close_fails_pending(self, tiny_pipe):
        eng = _engine(tiny_pipe)
        fut = eng.submit(_clip(22))
        eng.close()
        with pytest.raises(RuntimeError, match="closed"):
            fut.result(timeout=5)

    def test_non_default_generation_refused(self, tiny_pipe):
        import dataclasses

        from tiny_audio_tpu.continuous import ContinuousEngine

        old = tiny_pipe.model.gen_config
        tiny_pipe.model.gen_config = dataclasses.replace(
            old, repetition_penalty=1.3
        )
        try:
            with pytest.raises(ValueError, match="greedy serving default"):
                ContinuousEngine(tiny_pipe, start=False)
        finally:
            tiny_pipe.model.gen_config = old

    def test_warmup_compiles_grid_and_leaves_engine_clean(self, tiny_pipe):
        eng = _engine(tiny_pipe, n_slots=4)
        total = eng.warmup(log=lambda *_: None)
        assert total > 0
        assert all(s is None for s in eng._slots)
        assert sorted(eng._free) == list(range(4))
        # engine still works after warmup
        fut = eng.submit(_clip(50))
        _run_until_done(eng, [fut])
        assert isinstance(fut.result(timeout=5), str)

    def test_http_server_integration(self, tiny_pipe):
        """make_server accepts the engine as its batcher (same submit API)."""
        import json
        import threading
        import urllib.request

        from tiny_audio_tpu.continuous import ContinuousEngine
        from tiny_audio_tpu.handler import EndpointHandler
        from tiny_audio_tpu.serving import make_server

        audio = _clip(40)
        want = tiny_pipe.transcribe_batch([audio])[0]
        handler = EndpointHandler(pipeline=tiny_pipe)
        eng = ContinuousEngine(tiny_pipe, n_slots=2, chunk_steps=3)
        server = make_server(handler, host="127.0.0.1", port=0, batcher=eng)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/transcribe", data=audio.tobytes(),
                headers={"Content-Type": "application/pcm-f32"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                body = json.loads(r.read())
            assert body["text"] == want
        finally:
            server.shutdown()
            eng.close()

    def test_prefill_one_graph_per_prompt_bucket(self, tiny_pipe):
        """Different clip durations inside one prompt bucket must share ONE
        prefill graph: the engine right-pads prompts to PROMPT_BUCKET
        multiples (a real-length-keyed graph recompiled per ~80 ms of
        duration at request time, inside the shared lock)."""
        from tiny_audio_tpu.generation import prefill_prompt_cache

        eng = _engine(tiny_pipe)
        fut0 = eng.submit(_clip(60, 8000))
        _run_until_done(eng, [fut0])
        before = prefill_prompt_cache._cache_size()
        # 9000 and 15000 samples differ in real prompt length but share the
        # tiny config's single 128-token bucket (probed: t_real 100/104)
        futs = [eng.submit(_clip(61, 9000))]
        _run_until_done(eng, futs)
        futs.append(eng.submit(_clip(62, 15000)))
        _run_until_done(eng, [futs[-1]])
        assert prefill_prompt_cache._cache_size() == before

    def test_slot_pool_survives_prefill_failure(self, tiny_pipe):
        """A prefill that raises must fail the futures WITHOUT leaking the
        popped slots — each leak shrank the pool until _admit deadlocked."""
        eng = _engine(tiny_pipe, n_slots=4)
        orig = eng.model._splice_embeds_jit
        eng.model._splice_embeds_jit = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected prefill failure")
        )
        try:
            fut = eng.submit(_clip(70))
            admitted = eng._admit()
            with pytest.raises(RuntimeError, match="injected"):
                eng._prefill_and_insert(admitted)
        finally:
            eng.model._splice_embeds_jit = orig
        assert sorted(eng._free) == list(range(4))  # nothing leaked
        # pool still serves new work
        fut2 = eng.submit(_clip(71))
        _run_until_done(eng, [fut2])
        assert isinstance(fut2.result(timeout=5), str)

    def test_threaded_end_to_end(self, tiny_pipe):
        """The real driver thread: staggered submits from the caller side."""
        import time

        from tiny_audio_tpu.continuous import ContinuousEngine

        audios = [_clip(30 + i) for i in range(3)]
        want = [tiny_pipe.transcribe_batch([a])[0] for a in audios]
        eng = ContinuousEngine(tiny_pipe, n_slots=2, chunk_steps=3)
        try:
            futs = []
            for a in audios:
                futs.append(eng.submit(a))
                time.sleep(0.05)
            got = [f.result(timeout=120) for f in futs]
        finally:
            eng.close()
        assert got == want
