"""Realtime websocket serving: endpointer state machine + live WS session.

The endpointer is driven with a deterministic amplitude oracle (frame is
speech iff its mean |x| clears a threshold) so segmentation behavior is
exact; the end-to-end test speaks the AssemblyAI-v3-subset protocol our own
eval client uses (eval/evaluators/asr.py:160-225) against a tiny model.
"""

import json
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

    def test_feed_throttles_on_update_samples(self):
        cfg = EndpointerConfig(update_samples=8 * HOP)
        ep = TurnEndpointer(amp_vad, cfg)
        assert ep.feed(tone(HOP / SAMPLE_RATE)) == []  # below cadence: no scan
        assert not ep.turn_open


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
