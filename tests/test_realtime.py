"""Realtime websocket serving: endpointer state machine + live WS session.

The endpointer is driven with a deterministic amplitude oracle (frame is
speech iff its mean |x| clears a threshold) so segmentation behavior is
exact; the end-to-end test speaks the AssemblyAI-v3-subset protocol our own
eval client uses (eval/evaluators/asr.py:160-225) against a tiny model.
"""

import json
import time
import threading

import numpy as np
import pytest

from tiny_audio_tpu.realtime import (
    EndpointerConfig,
    RealtimeServer,
    TurnEndpointer,
)
from tiny_audio_tpu.vad import HOP, SAMPLE_RATE


def amp_vad(audio: np.ndarray) -> np.ndarray:
    n = len(audio) // HOP
    frames = np.abs(audio[: n * HOP]).reshape(n, HOP).mean(axis=1)
    return frames > 0.05


def tone(seconds: float, amp: float = 0.3) -> np.ndarray:
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    return (amp * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def silence(seconds: float) -> np.ndarray:
    return np.zeros(int(seconds * SAMPLE_RATE), np.float32)


CFG = EndpointerConfig(update_samples=1)  # rescan on every feed


class TestTurnEndpointer:
    def test_turn_opens_and_closes(self):
        ep = TurnEndpointer(amp_vad, CFG)
        events = ep.feed(np.concatenate([silence(0.3), tone(1.0)]))
        assert ("start",) in events
        assert ep.turn_open
        events = ep.feed(silence(1.0))
        finals = [e for e in events if e[0] == "final"]
        assert len(finals) == 1 and not ep.turn_open
        # turn clip = pre-roll + speech + hangover, NOT the 1 s of trailing
        # silence nor the 0.3 s lead-in beyond pre-roll
        dur = finals[0][1].size / SAMPLE_RATE
        pad = (CFG.pre_roll_frames + CFG.hangover_frames) * HOP / SAMPLE_RATE
        assert 0.95 <= dur <= 1.0 + pad + 0.05

    def test_silence_only_never_opens(self):
        ep = TurnEndpointer(amp_vad, CFG)
        for _ in range(10):
            assert ep.feed(silence(0.5)) == []
        assert not ep.turn_open
        # idle buffer is bounded, not accumulating 5 s
        assert ep.buf.size <= int(CFG.idle_tail_s * SAMPLE_RATE) + HOP

    def test_blip_shorter_than_start_frames_ignored(self):
        ep = TurnEndpointer(amp_vad, CFG)
        blip = tone((CFG.start_frames - 2) * HOP / SAMPLE_RATE)
        events = ep.feed(np.concatenate([silence(0.2), blip, silence(0.5)]))
        assert events == [] and not ep.turn_open

    def test_max_turn_force_close(self):
        cfg = EndpointerConfig(update_samples=1, max_turn_s=1.0)
        ep = TurnEndpointer(amp_vad, cfg)
        events = ep.feed(tone(1.5))
        finals = [e for e in events if e[0] == "final"]
        assert len(finals) == 1 and not ep.turn_open

    def test_force_endpoint_and_flush(self):
        ep = TurnEndpointer(amp_vad, CFG)
        ep.feed(tone(0.5))
        assert ep.turn_open
        finals = [e for e in ep.force_endpoint() if e[0] == "final"]
        assert len(finals) == 1
        assert ep.force_endpoint() == []  # idempotent when closed

        ep.feed(tone(0.5))
        finals = [e for e in ep.flush() if e[0] == "final"]
        assert len(finals) == 1 and ep.buf.size == 0

    def test_two_turns_get_separate_finals(self):
        ep = TurnEndpointer(amp_vad, CFG)
        finals = []
        for chunk in (tone(0.8), silence(1.0), tone(0.6), silence(1.0)):
            finals += [e for e in ep.feed(chunk) if e[0] == "final"]
        assert len(finals) == 2

    def test_final_carries_session_absolute_start(self):
        """ev[2] is the turn clip's first-sample offset in the SESSION
        stream (survives idle trims), feeding the ms word timestamps."""
        ep = TurnEndpointer(amp_vad, CFG)
        events = ep.feed(np.concatenate([silence(0.5), tone(1.0)]))
        events += ep.feed(silence(1.0))
        finals = [e for e in events if e[0] == "final"]
        assert len(finals) == 1
        start = finals[0][2]
        onset = int(0.5 * SAMPLE_RATE)
        pre_roll = CFG.pre_roll_frames * HOP
        # start = onset - pre_roll, within a frame of VAD grid slack
        assert abs(start - (onset - pre_roll)) <= 2 * HOP
        # a second turn later in the stream starts after the first ends
        events = ep.feed(np.concatenate([silence(3.0), tone(0.6)]))
        events += ep.feed(silence(1.0))
        finals2 = [e for e in events if e[0] == "final"]
        assert len(finals2) == 1
        assert finals2[0][2] > start + finals[0][1].size

    def test_flush_and_force_endpoint_carry_start(self):
        ep = TurnEndpointer(amp_vad, CFG)
        ep.feed(np.concatenate([silence(0.3), tone(0.5)]))
        (kind, audio, start) = ep.force_endpoint()[0]
        assert kind == "final" and start + audio.size == ep._fed

        ep.feed(np.concatenate([silence(2.0), tone(0.5)]))
        finals = [e for e in ep.flush() if e[0] == "final"]
        (kind, audio, start) = finals[0]
        assert start + audio.size == ep._fed

    def test_feed_throttles_on_update_samples(self):
        cfg = EndpointerConfig(update_samples=8 * HOP)
        ep = TurnEndpointer(amp_vad, cfg)
        assert ep.feed(tone(HOP / SAMPLE_RATE)) == []  # below cadence: no scan
        assert not ep.turn_open


class _StreamAmpOracle:
    """StreamingVad-shaped amplitude oracle: scores each HOP block once,
    carrying a pending-sample tail — lets the stream-mode endpointer be
    compared against batch mode with bitwise-identical decisions."""

    def __init__(self):
        self._pending = np.zeros(0, np.float32)

    def feed(self, samples: np.ndarray) -> np.ndarray:
        self._pending = np.concatenate(
            [self._pending, np.asarray(samples, np.float32).reshape(-1)]
        )
        k = self._pending.size // HOP
        if k == 0:
            return np.zeros(0, bool)
        dec = np.abs(self._pending[: k * HOP]).reshape(k, HOP).mean(axis=1) > 0.05
        self._pending = self._pending[k * HOP:]
        return dec

    def reset(self, keep_level: bool = True) -> None:
        self._pending = np.zeros(0, np.float32)


class TestStreamModeEndpointer:
    """TurnEndpointer(vad_stream=...) — incremental decisions, O(new audio)
    per feed — must segment exactly like batch mode given the same oracle."""

    def _run(self, ep, chunks):
        events = []
        for c in chunks:
            events += ep.feed(c)
        events += ep.flush()
        return events

    @pytest.mark.parametrize("chunk_s", [0.05, 0.1, 0.256])
    def test_matches_batch_mode(self, chunk_s):
        session = np.concatenate([
            silence(0.4), tone(0.9), silence(1.2), tone(0.6, amp=0.2),
            silence(0.9), tone(1.3), silence(0.8),
        ])
        step = int(chunk_s * SAMPLE_RATE)
        chunks = [session[i: i + step] for i in range(0, len(session), step)]
        batch = self._run(TurnEndpointer(amp_vad, CFG), chunks)
        stream = self._run(
            TurnEndpointer(None, CFG, vad_stream=_StreamAmpOracle()), chunks
        )
        assert [e[0] for e in batch] == [e[0] for e in stream]
        b_finals = [e[1] for e in batch if e[0] == "final"]
        s_finals = [e[1] for e in stream if e[0] == "final"]
        assert len(b_finals) == len(s_finals) == 3
        for b, s in zip(b_finals, s_finals):
            assert b.size == s.size
            np.testing.assert_array_equal(b, s)

    def test_max_turn_close_then_next_turn(self):
        cfg = EndpointerConfig(update_samples=1, max_turn_s=1.0)
        ep = TurnEndpointer(None, cfg, vad_stream=_StreamAmpOracle())
        finals = [e for e in ep.feed(tone(1.5)) if e[0] == "final"]
        assert len(finals) == 1 and not ep.turn_open
        ep.feed(silence(1.0))
        finals = [e for e in ep.feed(np.concatenate([tone(0.5), silence(1.0)]))
                  if e[0] == "final"]
        assert len(finals) == 1  # stream state survived the hard clear

    def test_requires_exactly_one_source(self):
        with pytest.raises(ValueError):
            TurnEndpointer(amp_vad, CFG, vad_stream=_StreamAmpOracle())
        with pytest.raises(ValueError):
            TurnEndpointer(None, CFG)

    def test_neural_stream_segments_synthetic_speech(self):
        from tiny_audio_tpu.utils.speech_synth import synth_utterance
        from tiny_audio_tpu.vad import StreamingVad

        sv = StreamingVad.make()
        if sv is None:
            pytest.skip("no trained VAD weights checked in")
        utt1, _ = synth_utterance(1.5, seed=21)
        utt2, _ = synth_utterance(1.2, seed=22)
        session = np.concatenate(
            [silence(0.5), utt1, silence(1.2), utt2, silence(1.0)]
        )
        ep = TurnEndpointer(None, EndpointerConfig(), vad_stream=sv)
        step = 1600
        finals = []
        for i in range(0, len(session), step):
            finals += [e for e in ep.feed(session[i: i + step])
                       if e[0] == "final"]
        finals += [e for e in ep.flush() if e[0] == "final"]
        assert len(finals) == 2
        # each turn clip roughly covers its utterance
        assert 1.0 <= finals[0][1].size / SAMPLE_RATE <= 2.5
        assert 0.8 <= finals[1][1].size / SAMPLE_RATE <= 2.2

    def test_server_defaults_to_stream_mode_with_weights(self):
        from tiny_audio_tpu.vad import NeuralVAD

        srv = RealtimeServer(pipe=None)  # ctor does not bind a socket
        if NeuralVAD.get() is not None:
            assert srv.vad_fn is None
            ep = srv._make_endpointer()
            assert ep.vad_stream is not None
        else:
            assert srv.vad_fn is not None


class TestOnlineSpeakerTracker:
    def _unit(self, v):
        v = np.asarray(v, np.float32)
        return v / np.linalg.norm(v)

    def test_same_voice_reuses_id(self):
        from tiny_audio_tpu.realtime import OnlineSpeakerTracker

        tr = OnlineSpeakerTracker()
        a = self._unit([1, 0.1, 0])
        assert tr.assign(a) == 0
        assert tr.assign(self._unit([1, 0.05, 0.02])) == 0

    def test_distinct_voice_founds_new_speaker(self):
        from tiny_audio_tpu.realtime import OnlineSpeakerTracker

        tr = OnlineSpeakerTracker()
        assert tr.assign(self._unit([1, 0, 0])) == 0
        assert tr.assign(self._unit([0, 1, 0])) == 1
        assert tr.assign(self._unit([1, 0.1, 0])) == 0  # back to A

    def test_max_speakers_caps_new_ids(self):
        from tiny_audio_tpu.realtime import OnlineSpeakerTracker

        tr = OnlineSpeakerTracker(max_speakers=2)
        tr.assign(self._unit([1, 0, 0]))
        tr.assign(self._unit([0, 1, 0]))
        # a third orthogonal voice must fold into the nearest existing id
        assert tr.assign(self._unit([0, 0, 1])) in (0, 1)

    def test_centroid_tracks_running_mean(self):
        from tiny_audio_tpu.realtime import OnlineSpeakerTracker

        tr = OnlineSpeakerTracker(threshold=0.8)
        base = self._unit([1, 0, 0])
        tr.assign(base)
        # drift in small steps: each stays within threshold of the
        # running centroid even though the last is far from the first
        for ang in (0.15, 0.3, 0.45):
            v = self._unit([np.cos(ang), np.sin(ang), 0])
            assert tr.assign(v) == 0


@pytest.fixture(scope="module")
def rt_server():
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.pipeline import ASRPipeline

    model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
    server = RealtimeServer(
        ASRPipeline(model), host="127.0.0.1", port=0,
        partial_every_s=0.0, vad_fn=amp_vad,
        endpointer_config=EndpointerConfig(update_samples=1),
    ).start()
    yield server
    server.shutdown()


def _session(server, chunks, extra_msgs=()):
    """Stream PCM16 chunks, Terminate, return all server messages."""
    from websockets.sync.client import connect

    msgs = []
    # ping_interval=None: client and server share this 1-core process, and
    # an XLA compile stalls pong handling past the 20 s keepalive window
    with connect(
        f"ws://127.0.0.1:{server.port}/ws?sample_rate=16000",
        ping_interval=None,
    ) as ws:
        for chunk in chunks:
            pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
            ws.send(pcm)
        for m in extra_msgs:
            ws.send(json.dumps(m))
        ws.send(json.dumps({"type": "Terminate"}))
        while True:
            msgs.append(json.loads(ws.recv(timeout=120)))
            if msgs[-1]["type"] == "Termination":
                break
    return msgs


class TestRealtimeSession:
    def test_full_session_protocol(self, rt_server):
        msgs = _session(
            rt_server,
            [tone(1.2), silence(1.0)],
        )
        assert msgs[0]["type"] == "Begin" and "id" in msgs[0]
        turns = [m for m in msgs if m["type"] == "Turn"]
        finals = [t for t in turns if t["end_of_turn"]]
        assert len(finals) == 1 and finals[0]["turn_order"] == 0
        assert isinstance(finals[0]["transcript"], str)
        # partial_every_s=0 => at least one partial preceded the final
        partials = [t for t in turns if not t["end_of_turn"]]
        assert partials and partials[0]["turn_order"] == 0
        term = msgs[-1]
        assert term["audio_duration_seconds"] == pytest.approx(2.2, abs=0.05)

    def test_terminate_flushes_open_turn(self, rt_server):
        # speech with NO trailing silence: the final must come from flush
        msgs = _session(rt_server, [tone(0.8)])
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1

    def test_force_endpoint(self, rt_server):
        msgs = _session(
            rt_server, [tone(0.8)], extra_msgs=({"type": "ForceEndpoint"},)
        )
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1 and finals[0]["turn_order"] == 0

    def test_resampling_8k_input(self, rt_server):
        # 8 kHz client: server must resample; 0.8 s of tone still one turn
        t = np.arange(int(0.8 * 8000)) / 8000
        speech8k = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        from websockets.sync.client import connect

        msgs = []
        with connect(
            f"ws://127.0.0.1:{rt_server.port}/ws?sample_rate=8000",
            ping_interval=None,
        ) as ws:
            ws.send((speech8k * 32767).astype("<i2").tobytes())
            ws.send(np.zeros(8000, "<i2").tobytes())  # 1 s silence
            ws.send(json.dumps({"type": "Terminate"}))
            while True:
                msgs.append(json.loads(ws.recv(timeout=120)))
                if msgs[-1]["type"] == "Termination":
                    break
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1

    def test_aai_eval_client_speaks_to_this_server(self, rt_server,
                                                   monkeypatch):
        """The repo's AssemblyAI-v3 streaming evaluator (a *client*) runs
        against this server with only base_url changed — protocol parity."""
        monkeypatch.setenv("ASSEMBLYAI_API_KEY", "local-test")
        from tiny_audio_tpu.eval.evaluators.asr import (
            AssemblyAIStreamingEvaluator,
        )

        ev = AssemblyAIStreamingEvaluator(
            base_url=f"ws://127.0.0.1:{rt_server.port}/ws"
        )
        audio = np.concatenate([tone(1.0), silence(1.0)])
        text = ev.transcribe(
            {"array": audio, "sampling_rate": 16000}, {}
        )
        assert isinstance(text, str)

    def test_live_speaker_attribution(self, rt_server):
        """?speakers=true labels each final Turn; two alternating synthetic
        voices get distinct stable labels (synthetic ECAPA tier)."""
        from websockets.sync.client import connect

        from tiny_audio_tpu.realtime import RealtimeServer

        from tiny_audio_tpu.utils.speech_synth import synth_utterance

        # separate server: no partials, same (warmed) pipeline; the
        # amplitude oracle needs a lower bar for peak-normalized synth
        # speech (voiced frame means sit well under the tone level)
        def synth_vad(audio):
            n = len(audio) // HOP
            frames = np.abs(audio[: n * HOP]).reshape(n, HOP).mean(axis=1)
            return frames > 0.02

        server = RealtimeServer(
            rt_server.pipe, host="127.0.0.1", port=0,
            partial_every_s=1e9, vad_fn=synth_vad,
            endpointer_config=EndpointerConfig(update_samples=1),
        ).start()
        try:
            voice_a = dict(f0=120.0, vocal_tract_scale=1.0)
            voice_b = dict(f0=210.0, vocal_tract_scale=1.18)
            chunks = []
            for i, voice in enumerate((voice_a, voice_b, voice_a)):
                # speech_fraction=0.85: default word pauses can exceed the
                # 0.64 s endpoint window and split one utterance in two
                utt, _ = synth_utterance(2.0, 16000, seed=i, level=0.3,
                                         speech_fraction=0.85, **voice)
                chunks += [utt, silence(1.0)]
            msgs = []
            with connect(
                f"ws://127.0.0.1:{server.port}/ws?speakers=true",
                ping_interval=None,
            ) as ws:
                for chunk in chunks:
                    pcm = (np.clip(chunk, -1, 1) * 32767
                           ).astype("<i2").tobytes()
                    ws.send(pcm)
                ws.send(json.dumps({"type": "Terminate"}))
                while True:
                    msgs.append(json.loads(ws.recv(timeout=300)))
                    if msgs[-1]["type"] == "Termination":
                        break
            finals = [m for m in msgs
                      if m["type"] == "Turn" and m["end_of_turn"]]
            assert len(finals) == 3
            speakers = [f.get("speaker") for f in finals]
            assert all(s is not None for s in speakers)
            assert speakers[0] == speakers[2]  # voice A re-identified
            assert speakers[0] != speakers[1]  # voice B is a new label
        finally:
            server.shutdown()

    def test_speakers_off_by_default(self, rt_server):
        msgs = _session(rt_server, [tone(1.0), silence(1.0)])
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert finals and "speaker" not in finals[0]

    def test_realtime_eval_backend(self, rt_server):
        """`ta eval --backend realtime`: WER through the websocket path."""
        from tiny_audio_tpu.eval.datasets import load_eval_dataset
        from tiny_audio_tpu.eval.evaluators.asr import LocalRealtimeEvaluator

        ev = LocalRealtimeEvaluator("tiny", pipeline=rt_server.pipe)
        try:
            rows = load_eval_dataset("synthetic", num_samples=2)
            results, metrics = ev.evaluate(rows, num_samples=2)
            assert len(results) == 2
            assert "corpus_wer" in metrics and "turns_avg" in metrics
            # transcripts joined from endpointed turns are plain strings
            assert all(isinstance(r.prediction, str) for r in results)
        finally:
            ev.close()

    def test_cohosted_http_and_ws_share_lock(self, rt_server):
        """serve(--realtime-port) layout: HTTP server + WS server on one
        pipeline and one TPU lock, serving concurrently."""
        import urllib.request

        from tiny_audio_tpu.handler import EndpointHandler
        from tiny_audio_tpu.serving import make_server

        handler = EndpointHandler(pipeline=rt_server.pipe)
        http = make_server(handler, host="127.0.0.1", port=0,
                           lock=rt_server.lock)
        http_port = http.server_address[1]
        t = threading.Thread(target=http.serve_forever, daemon=True)
        t.start()
        try:
            results = {}

            def ws_session():
                results["ws"] = _session(rt_server, [tone(0.6), silence(1.0)])

            def http_post():
                pcm = tone(0.5).tobytes()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{http_port}/transcribe",
                    data=pcm,
                    headers={"Content-Type": "application/pcm-f32"},
                )
                with urllib.request.urlopen(req, timeout=120) as resp:
                    results["http"] = json.loads(resp.read())

            threads = [threading.Thread(target=ws_session),
                       threading.Thread(target=http_post)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=180)
            assert "text" in results["http"]
            finals = [m for m in results["ws"]
                      if m["type"] == "Turn" and m["end_of_turn"]]
            assert len(finals) == 1
        finally:
            http.shutdown()

    def test_concurrent_sessions_share_lock(self, rt_server):
        results = {}

        def run(key):
            results[key] = _session(rt_server, [tone(0.6), silence(1.0)])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for key in (0, 1):
            finals = [m for m in results[key]
                      if m["type"] == "Turn" and m["end_of_turn"]]
            assert len(finals) == 1


class TestWordTimestamps:
    def test_timestamps_query_adds_words(self, rt_server):
        """?timestamps=true finals carry AAI-format words: text/start/end
        in session-absolute ms, monotonic, inside the turn's extent.  The
        weightless test aligner uniform-spreads words (tagged fallback) —
        this pins the protocol plumbing, not alignment quality."""
        from websockets.sync.client import connect

        msgs = []
        with connect(
            f"ws://127.0.0.1:{rt_server.port}/ws"
            "?sample_rate=16000&timestamps=true",
            ping_interval=None,
        ) as ws:
            for chunk in (silence(0.5), tone(1.2), silence(1.0)):
                pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
                ws.send(pcm)
            ws.send(json.dumps({"type": "Terminate"}))
            while True:
                msgs.append(json.loads(ws.recv(timeout=120)))
                if msgs[-1]["type"] == "Termination":
                    break
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1
        final = finals[0]
        if not final["transcript"]:
            pytest.skip("tiny model produced empty transcript")
        words = final["words"]
        assert words, "timestamps=true final must carry words"
        n_words = len(final["transcript"].split())
        assert len(words) == n_words
        # session-absolute ms: the turn starts near the 0.5 s onset minus
        # pre-roll, so no word may start before ~0.2 s or end after the
        # 2.7 s session
        for w in words:
            assert isinstance(w["text"], str)
            assert isinstance(w["start"], int) and isinstance(w["end"], int)
            assert 200 <= w["start"] < w["end"] <= 2700
        starts = [w["start"] for w in words]
        assert starts == sorted(starts)
        # partials never carry words (alignment is final-only work)
        partials = [m for m in msgs
                    if m["type"] == "Turn" and not m["end_of_turn"]]
        assert all("words" not in p for p in partials)

    def test_no_timestamps_by_default(self, rt_server):
        msgs = _session(rt_server, [tone(0.8), silence(1.0)])
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert finals and all("words" not in f for f in finals)


class TestBatchedTurnDecodes:
    """RealtimeServer(batcher=...) coalesces turn decodes from concurrent
    sessions through the dynamic batcher instead of lock-serializing."""

    @pytest.fixture()
    def batched_server(self):
        from tiny_audio_tpu.batching import DynamicBatcher
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        pipe = ASRPipeline(
            ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        )
        batcher = DynamicBatcher(pipe, max_batch=4, max_wait_ms=30.0)
        server = RealtimeServer(
            pipe, host="127.0.0.1", port=0,
            partial_every_s=0.0, vad_fn=amp_vad, batcher=batcher,
            endpointer_config=EndpointerConfig(update_samples=1),
        ).start()
        yield server, batcher
        server.shutdown()
        batcher.close()

    def test_finals_flow_through_batcher(self, batched_server):
        server, batcher = batched_server
        submitted = []
        orig = batcher.submit

        def spy(audio, user_prompt=None):
            submitted.append(np.asarray(audio).size)
            return orig(audio, user_prompt)

        batcher.submit = spy
        msgs = _session(server, [tone(0.8), silence(1.0)])
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1
        assert isinstance(finals[0]["transcript"], str)
        assert submitted  # the final's decode went through the batcher

    def test_concurrent_sessions_share_batches(self, batched_server):
        server, _ = batched_server
        results = [None] * 3

        def run(i):
            results[i] = _session(server, [tone(0.8), silence(1.0)])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for msgs in results:
            assert msgs is not None
            finals = [m for m in msgs
                      if m["type"] == "Turn" and m["end_of_turn"]]
            assert len(finals) == 1
            # async partials must never arrive AFTER their turn's final
            # (sess["gen"] stale-drop): within each turn_order, the final
            # is the last Turn message
            turns = [m for m in msgs if m["type"] == "Turn"]
            for i, m in enumerate(turns):
                if not m["end_of_turn"]:
                    assert any(
                        f["end_of_turn"]
                        and f["turn_order"] == m["turn_order"]
                        for f in turns[i + 1:]
                    ), "partial delivered after its turn's final"

    def test_lock_defaults_to_batcher_lock(self, batched_server):
        server, batcher = batched_server
        assert server.lock is batcher.lock

    def test_continuous_engine_as_batcher(self):
        """The slot-based engine duck-types submit()/pending()/lock, so
        realtime turn decodes can join its decode loop mid-flight too
        (serve --engine continuous --realtime-port)."""
        from tiny_audio_tpu.config import tiny_test_config
        from tiny_audio_tpu.continuous import ContinuousEngine
        from tiny_audio_tpu.models.asr import ASRModel
        from tiny_audio_tpu.pipeline import ASRPipeline

        pipe = ASRPipeline(
            ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
        )
        eng = ContinuousEngine(pipe, n_slots=2, chunk_steps=3)
        server = RealtimeServer(
            pipe, host="127.0.0.1", port=0,
            partial_every_s=0.0, vad_fn=amp_vad, batcher=eng,
            endpointer_config=EndpointerConfig(update_samples=1),
        ).start()
        try:
            assert server.lock is eng.lock
            msgs = _session(server, [tone(0.8), silence(1.0)])
            finals = [m for m in msgs
                      if m["type"] == "Turn" and m["end_of_turn"]]
            assert len(finals) == 1
            assert isinstance(finals[0]["transcript"], str)
        finally:
            server.shutdown()
            eng.close()


class TestAsyncPartials:
    """Batcher-mode partials must not block the receive loop: they submit
    asynchronously (one in flight per session) and are dropped when their
    turn closed before the batch resolved — the fix for the measured
    13.1 s endpoint latency under a 16-session burst
    (docs/performance.md)."""

    @staticmethod
    def _server_with_fake_batcher():
        from concurrent.futures import Future
        from unittest.mock import MagicMock

        class FakeBatcher:
            lock = threading.Lock()

            def __init__(self):
                self.futs = []

            def submit(self, audio, user_prompt=None):
                fut = Future()
                self.futs.append(fut)
                return fut

            def pending(self):
                return 0

        batcher = FakeBatcher()
        server = RealtimeServer(
            MagicMock(), host="127.0.0.1", port=0, vad_fn=amp_vad,
            batcher=batcher,
        )  # never start()ed: _submit_partial_async is exercised directly

        class FakeWS:
            def __init__(self):
                self.sent = []

            def send(self, msg):
                self.sent.append(json.loads(msg))

        return server, batcher, FakeWS()

    def test_submit_returns_without_blocking_and_delivers(self):
        server, batcher, ws = self._server_with_fake_batcher()
        sess = {"inflight": False, "gen": 0}
        assert server._submit_partial_async(ws, silence(0.5), 3, sess)
        assert sess["inflight"] and not ws.sent  # returned, nothing sent yet
        # throttle: a second submit while one is in flight is refused
        assert not server._submit_partial_async(ws, silence(0.5), 3, sess)
        batcher.futs[0].set_result(["hello there"][0])
        assert not sess["inflight"]
        assert ws.sent == [{
            "type": "Turn", "turn_order": 3, "transcript": "hello there",
            "end_of_turn": False, "turn_is_formatted": False,
        }]

    def test_stale_partial_dropped_after_turn_close(self):
        server, batcher, ws = self._server_with_fake_batcher()
        sess = {"inflight": False, "gen": 0}
        assert server._submit_partial_async(ws, silence(0.5), 0, sess)
        sess["gen"] += 1  # what _dispatch does when the turn's final fires
        batcher.futs[0].set_result("stale partial")
        assert ws.sent == []          # dropped, never sent after the final
        assert not sess["inflight"]   # slot freed for the next turn

    def test_failed_results_silent_empty_still_ship(self):
        server, batcher, ws = self._server_with_fake_batcher()
        sess = {"inflight": False, "gen": 0}
        assert server._submit_partial_async(ws, silence(0.5), 0, sess)
        batcher.futs[0].set_exception(RuntimeError("batch died"))
        assert ws.sent == [] and not sess["inflight"]
        assert server._submit_partial_async(ws, silence(0.5), 0, sess)
        # empty transcripts still ship (solo-path parity: early-turn
        # partials are often empty and clients key TTFB off them)
        batcher.futs[1].set_result("")
        assert len(ws.sent) == 1 and ws.sent[0]["transcript"] == ""
        assert not sess["inflight"]

    def test_dispatch_bumps_generation_on_final(self):
        from unittest.mock import MagicMock

        server, batcher, ws = self._server_with_fake_batcher()
        server._transcribe = MagicMock(return_value="final text")
        sess = {"inflight": False, "gen": 0}
        turn = server._dispatch(
            ws, [("final", tone(0.5), 0)], 0, sess=sess
        )
        assert turn == 1 and sess["gen"] == 1
        assert ws.sent and ws.sent[-1]["end_of_turn"]


class TestAdversarialClients:
    """Malformed client traffic must never kill a session or the server."""

    def test_garbage_messages_session_still_works(self, rt_server):
        from websockets.sync.client import connect

        with connect(
            f"ws://127.0.0.1:{rt_server.port}/ws?sample_rate=16000",
            ping_interval=None,
        ) as ws:
            ws.send("not json at all")
            ws.send(json.dumps([1, 2, 3]))          # valid JSON, not a dict
            ws.send(json.dumps({"no_type": True}))   # dict without a type
            ws.send(b"\x01")                          # odd-byte PCM frame
            # the session must still transcribe after all of that
            for chunk in (tone(0.8), silence(1.0)):
                pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
                ws.send(pcm)
            ws.send(json.dumps({"type": "Terminate"}))
            msgs = []
            while True:
                msgs.append(json.loads(ws.recv(timeout=120)))
                if msgs[-1]["type"] == "Termination":
                    break
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1

    def test_invalid_sample_rate_defaults(self, rt_server):
        """?sample_rate=0 must not divide-by-zero in resample; it falls
        back to 16 kHz and the session works."""
        from websockets.sync.client import connect

        with connect(
            f"ws://127.0.0.1:{rt_server.port}/ws?sample_rate=0",
            ping_interval=None,
        ) as ws:
            for chunk in (tone(0.8), silence(1.0)):
                pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
                ws.send(pcm)
            ws.send(json.dumps({"type": "Terminate"}))
            msgs = []
            while True:
                msgs.append(json.loads(ws.recv(timeout=120)))
                if msgs[-1]["type"] == "Termination":
                    break
        finals = [m for m in msgs
                  if m["type"] == "Turn" and m["end_of_turn"]]
        assert len(finals) == 1
        assert msgs[-1]["audio_duration_seconds"] == pytest.approx(1.8, abs=0.05)


def test_active_sessions_gauge(rt_server):
    from websockets.sync.client import connect

    base = rt_server.active_sessions()
    with connect(f"ws://127.0.0.1:{rt_server.port}/ws", ping_interval=None):
        deadline = time.time() + 10
        while rt_server.active_sessions() != base + 1 and time.time() < deadline:
            time.sleep(0.02)
        assert rt_server.active_sessions() == base + 1
    deadline = time.time() + 10
    while rt_server.active_sessions() != base and time.time() < deadline:
        time.sleep(0.02)
    assert rt_server.active_sessions() == base


def test_confidence_query_on_finals(rt_server):
    from websockets.sync.client import connect

    with connect(
        f"ws://127.0.0.1:{rt_server.port}/ws?sample_rate=16000&confidence=true",
        ping_interval=None,
    ) as ws:
        for chunk in (tone(0.8), silence(1.0)):
            pcm = (np.clip(chunk, -1, 1) * 32767).astype("<i2").tobytes()
            ws.send(pcm)
        ws.send(json.dumps({"type": "Terminate"}))
        msgs = []
        while True:
            msgs.append(json.loads(ws.recv(timeout=120)))
            if msgs[-1]["type"] == "Termination":
                break
    finals = [m for m in msgs if m["type"] == "Turn" and m["end_of_turn"]]
    assert len(finals) == 1
    assert 0.0 < finals[0]["confidence"] <= 1.0
    partials = [m for m in msgs
                if m["type"] == "Turn" and not m["end_of_turn"]]
    assert all("confidence" not in p for p in partials)
