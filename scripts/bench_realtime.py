#!/usr/bin/env python3
"""Benchmark the realtime websocket server at flagship size on the real chip.

Drives N concurrent client sessions at REAL-TIME pace (100 ms PCM16 chunks,
the cadence our AAI-v3 eval client uses) through
:class:`tiny_audio_tpu.realtime.RealtimeServer` and measures what a voice
agent feels:

- ``first_partial_s``   speech onset (wall) -> first partial transcript
- ``endpoint_latency_s``  last speech chunk sent -> final Turn received.
  Floor = endpointer silence window (~0.64 s) + one decode; the gap above
  the floor is the serving overhead.
- all sessions must receive exactly one final per spoken turn (delivery
  under lock contention).

Audio is formant-synthesized speech (utils/speech_synth.py) — the trained
VAD's validation domain — so endpointing exercises the REAL neural VAD, not
an oracle.  Weights are random (latency does not depend on weight values).

Run on the default (TPU) env:  python scripts/bench_realtime.py
Env knobs: TA_BENCH_RT_SESSIONS (default 4), TA_BENCH_RT_SPEECH_S (default
4), TA_BENCH_RT_BATCHER=1 (coalesce turn decodes through the dynamic
batcher — the high-session-count mode; warms the batch-row graphs for the
session-length bucket instead of the full solo grid),
TA_BENCH_RT_SOAK_S=<seconds> (soak mode: ONE long-lived session cycling
speech/silence turns for that long; reports per-cycle endpoint-latency
drift first-vs-last quarter and process RSS growth — the leak detector
VERDICT r3 asked for).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_S = 0.1  # 100 ms frames, 16 kHz


def build_session_audio(seed: int, speech_s: float):
    """1 s lead-in silence + speech + 1.5 s tail silence; returns
    (audio, index of the last chunk containing speech)."""
    from tiny_audio_tpu.utils.speech_synth import synth_utterance

    utt, mask = synth_utterance(speech_s, 16000, seed=seed)
    lead = np.zeros(16000, np.float32)
    tail = np.zeros(24000, np.float32)
    audio = np.concatenate([lead, utt, tail])
    speech_idx = np.flatnonzero(mask)
    last_speech_sample = len(lead) + int(speech_idx[-1])
    first_speech_sample = len(lead) + int(speech_idx[0])
    chunk = int(CHUNK_S * 16000)
    return audio, first_speech_sample // chunk, last_speech_sample // chunk


def run_session(port: int, seed: int, speech_s: float, out: dict) -> None:
    from websockets.sync.client import connect

    audio, first_chunk, last_chunk = build_session_audio(seed, speech_s)
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    chunk_bytes = int(CHUNK_S * 16000) * 2

    events = []  # (wall_time, msg)
    t_first_speech = t_last_speech = None

    with connect(f"ws://127.0.0.1:{port}/?sample_rate=16000",
                 ping_interval=None) as ws:
        done = threading.Event()

        def reader():
            try:
                while True:
                    msg = json.loads(ws.recv(timeout=300))
                    events.append((time.time(), msg))
                    if msg["type"] == "Termination":
                        break
            except Exception:
                pass
            done.set()

        rt = threading.Thread(target=reader, daemon=True)
        rt.start()
        next_t = time.time()
        for i in range(0, len(pcm), chunk_bytes):
            ws.send(pcm[i: i + chunk_bytes])
            ci = i // chunk_bytes
            if ci == first_chunk:
                t_first_speech = time.time()
            if ci == last_chunk:
                t_last_speech = time.time()
            next_t += CHUNK_S  # real-time pacing
            delay = next_t - time.time()
            if delay > 0:
                time.sleep(delay)
        ws.send(json.dumps({"type": "Terminate"}))
        done.wait(timeout=300)

    partials = [(t, m) for t, m in events
                if m["type"] == "Turn" and not m["end_of_turn"]]
    finals = [(t, m) for t, m in events
              if m["type"] == "Turn" and m["end_of_turn"]]
    out["n_finals"] = len(finals)
    out["n_partials"] = len(partials)
    if partials and t_first_speech:
        out["first_partial_s"] = partials[0][0] - t_first_speech
    if finals and t_last_speech:
        # Synth word pauses can exceed the 640 ms endpoint window and split
        # the utterance into several turns; the endpoint latency is the
        # CLOSING final — the first one after the last speech chunk (the
        # first final overall may precede it, yielding negative garbage).
        closing = [t for t, _ in finals if t >= t_last_speech]
        if closing:
            out["endpoint_latency_s"] = closing[0] - t_last_speech


def _rss_mb() -> float:
    """This process's resident set (server runs in-process)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def run_soak_session(port: int, seconds: float, speech_s: float,
                     out: dict) -> None:
    """One long-lived session: repeated speech/silence cycles at real-time
    pace for ``seconds``; records per-cycle endpoint latency + RSS so drift
    (leaking per-session state, growing latency) is visible."""
    from websockets.sync.client import connect

    chunk = int(CHUNK_S * 16000)
    events = []
    latencies, rss, cycle_walls = [], [], []
    # TA_BENCH_RT_PROBE=1: attribute RSS growth every 20 cycles —
    # tracemalloc (Python-heap allocations) vs jax.live_arrays bytes
    # (device/host array handles) vs raw RSS (native/XLA/tunnel if the
    # other two are flat).
    probe = os.environ.get("TA_BENCH_RT_PROBE") == "1"
    probes: list[tuple] = []
    if probe:
        import tracemalloc

        tracemalloc.start()

    with connect(f"ws://127.0.0.1:{port}/?sample_rate=16000",
                 ping_interval=None) as ws:
        done = threading.Event()

        def reader():
            try:
                while True:
                    msg = json.loads(ws.recv(timeout=300))
                    events.append((time.time(), msg))
                    if msg["type"] == "Termination":
                        break
            except Exception:
                pass
            done.set()

        threading.Thread(target=reader, daemon=True).start()

        t_end = time.time() + seconds
        next_t = time.time()
        cycle = 0
        while time.time() < t_end:
            audio, _, last_chunk = build_session_audio(100 + cycle, speech_s)
            pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
            t_last_speech = None
            for i in range(0, len(pcm), chunk * 2):
                ws.send(pcm[i: i + chunk * 2])
                if i // (chunk * 2) == last_chunk:
                    t_last_speech = time.time()
                next_t += CHUNK_S
                delay = next_t - time.time()
                if delay > 0:
                    time.sleep(delay)
            # wait (paced, keep feeding silence) until this cycle's final
            silence = bytes(chunk * 2)
            deadline = time.time() + 60
            got = None
            while time.time() < deadline:
                got = next((t for t, m in events
                            if m["type"] == "Turn" and m["end_of_turn"]
                            and t_last_speech and t >= t_last_speech), None)
                if got is not None:
                    break
                ws.send(silence)
                next_t += CHUNK_S
                delay = next_t - time.time()
                if delay > 0:
                    time.sleep(delay)
            if got is not None and t_last_speech is not None:
                latencies.append(got - t_last_speech)
            rss.append(_rss_mb())
            cycle_walls.append(time.time())
            cycle += 1
            if probe and cycle % 20 == 0:
                import tracemalloc

                import jax as _jax

                py_mb = tracemalloc.get_traced_memory()[0] / 1e6
                dev = sum(
                    a.size * a.dtype.itemsize for a in _jax.live_arrays()
                ) / 1e6
                rss_before = _rss_mb()
                # malloc_trim differential: the first probed soak showed the
                # growth is NATIVE (python heap + device arrays both flat).
                # If trim reclaims it, it's freed-but-unreturned glibc heap
                # (arena fragmentation from per-chunk churn) — a reporting
                # artifact, not held memory.
                trimmed = None
                try:
                    import ctypes

                    ctypes.CDLL("libc.so.6").malloc_trim(0)
                    trimmed = round(_rss_mb(), 1)
                except OSError:
                    pass
                probes.append((cycle, round(rss_before, 1), round(py_mb, 1),
                               round(dev, 1), trimmed))
        ws.send(json.dumps({"type": "Terminate"}))
        done.wait(timeout=60)

    out["latencies"] = latencies
    out["rss_mb"] = rss
    out["cycles"] = cycle
    out["finals"] = sum(1 for _, m in events
                        if m["type"] == "Turn" and m["end_of_turn"])
    if probe:
        out["probes_cycle_rss_py_dev_trim_mb"] = probes


def main() -> None:
    from tiny_audio_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    import jax

    from tiny_audio_tpu.config import ASRConfig
    from tiny_audio_tpu.handler import EndpointHandler
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.pipeline import ASRPipeline
    from tiny_audio_tpu.realtime import RealtimeServer

    n_sessions = int(os.environ.get("TA_BENCH_RT_SESSIONS", "4"))
    speech_s = float(os.environ.get("TA_BENCH_RT_SPEECH_S", "4"))

    if os.environ.get("TA_BENCH_RT_TINY"):  # CPU shakeout of the harness
        from tiny_audio_tpu.config import tiny_test_config

        cfg = tiny_test_config(model_dtype="float32")
    else:
        cfg = ASRConfig()
        cfg.kv_cache_dtype = os.environ.get("TA_BENCH_KV", "int8")
    model = ASRModel(cfg, seed=0)
    handler = EndpointHandler(pipeline=ASRPipeline(model))
    use_batcher = bool(os.environ.get("TA_BENCH_RT_BATCHER"))
    t0 = time.time()
    if os.environ.get("TA_BENCH_RT_TINY"):
        # tiny config's encoder window is smaller than the production mel
        # buckets warmup compiles; one direct call warms the tiny graphs
        handler.pipe({"array": np.zeros(16000, np.float32),
                      "sampling_rate": 16000})
    elif use_batcher:
        # batcher mode: warm exactly the shapes this bench dispatches —
        # solo + BATCH_BUCKETS rows at the session turn lengths (every
        # turn here is speech_s + trimmings, one mel/prompt bucket)
        for n in (1600, int((speech_s + 2.0) * 16000)):
            for rows in handler.pipe.BATCH_BUCKETS:
                handler.pipe.transcribe_batch(
                    [np.zeros(n, np.float32)] * rows
                )
    else:
        # longform=False: realtime turns are force-closed at 28 s, so the
        # chunked >30 s graphs never run in this server
        handler.warmup(batched=False, longform=False,
                       log=lambda *_: None)
    warmup_s = time.time() - t0

    batcher = None
    if use_batcher:
        from tiny_audio_tpu.batching import DynamicBatcher

        batcher = DynamicBatcher(handler.pipe, max_batch=16,
                                 max_wait_ms=30.0)
    server = RealtimeServer(
        handler.pipe, host="127.0.0.1", port=0, partial_every_s=0.5,
        batcher=batcher,
    ).start()

    soak_s = float(os.environ.get("TA_BENCH_RT_SOAK_S", "0"))
    if soak_s > 0:
        out: dict = {}
        rss0 = _rss_mb()
        run_soak_session(server.port, soak_s, speech_s, out)
        server.shutdown()
        lat = out.get("latencies", [])
        rss = out.get("rss_mb", [])
        q = max(len(lat) // 4, 1)
        print(json.dumps({
            "metric": "realtime_ws_soak_endpoint_latency_p50",
            "value": round(float(np.median(lat)), 3) if lat else None,
            "unit": "s",
            "extra": {
                "soak_s": soak_s,
                "cycles": out.get("cycles"),
                "finals": out.get("finals"),
                "latency_first_quarter_p50_s":
                    round(float(np.median(lat[:q])), 3) if lat else None,
                "latency_last_quarter_p50_s":
                    round(float(np.median(lat[-q:])), 3) if lat else None,
                "latency_max_s": round(float(np.max(lat)), 3) if lat else None,
                "rss_start_mb": round(rss0, 1),
                "rss_first_cycle_mb": round(rss[0], 1) if rss else None,
                "rss_last_cycle_mb": round(rss[-1], 1) if rss else None,
                "rss_max_mb": round(float(np.max(rss)), 1) if rss else None,
                "warmup_s": round(warmup_s, 1),
                "backend": jax.default_backend(),
                **({"probes_cycle_rss_py_dev_trim_mb":
                    out["probes_cycle_rss_py_dev_trim_mb"]}
                   if "probes_cycle_rss_py_dev_trim_mb" in out else {}),
            },
        }), flush=True)
        os._exit(0)

    results = [dict() for _ in range(n_sessions)]
    threads = [
        threading.Thread(target=run_session,
                         args=(server.port, 7 + i, speech_s, results[i]))
        for i in range(n_sessions)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    wall = time.time() - t0
    server.shutdown()

    ok = all(r.get("n_finals", 0) >= 1 for r in results)
    ep = [r["endpoint_latency_s"] for r in results
          if "endpoint_latency_s" in r]
    fp = [r["first_partial_s"] for r in results if "first_partial_s" in r]
    print(json.dumps({
        "metric": "realtime_ws_endpoint_latency_p50",
        "value": round(float(np.median(ep)), 3) if ep else None,
        "unit": "s",
        "extra": {
            "sessions": n_sessions,
            "speech_s_per_session": speech_s,
            "all_sessions_got_finals": ok,
            "endpoint_latency_p95_s": round(float(np.percentile(ep, 95)), 3)
            if ep else None,
            "endpoint_latency_p99_s": round(float(np.percentile(ep, 99)), 3)
            if ep else None,
            "first_partial_p50_s": round(float(np.median(fp)), 3)
            if fp else None,
            "partials_per_session": [r.get("n_partials", 0)
                                     for r in results],
            "silence_window_s": 0.64,  # endpointer floor inside the latency
            "wall_s": round(wall, 1),
            "warmup_s": round(warmup_s, 1),
            "batched_decodes": use_batcher,
            "backend": jax.default_backend(),
        },
    }), flush=True)
    # hard-exit: lingering daemon websocket reader threads + jaxlib teardown
    # abort the interpreter on this rig AFTER the result is printed; the
    # bench's contract is the JSON line above
    os._exit(0)


if __name__ == "__main__":
    main()
