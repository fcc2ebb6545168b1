"""Realtime WebSocket transcription: continuous audio in, turn transcripts out.

The reference consumes realtime ASR only as a *client* of AssemblyAI's v3
streaming API (reference scripts/eval/evaluators/asr.py:271-352); it ships no
server of its own.  Here the framework IS the server: 16 kHz PCM16 frames
stream in over a websocket, the causal neural VAD (:mod:`tiny_audio_tpu.vad`)
segments speech into turns online, and each turn is transcribed on-TPU —
partial transcripts while the speaker is still talking, a final one when the
endpointer closes the turn.

The wire protocol is the AssemblyAI-v3 subset this repo's own eval client
already speaks (eval/evaluators/asr.py:160-225):

    client -> binary frames   16-bit LE mono PCM (any chunking)
    client -> {"type": "Terminate"}          flush + end session
    client -> {"type": "ForceEndpoint"}      close the current turn now
    server -> {"type": "Begin", "id": ...}
    server -> {"type": "Turn", "turn_order": n, "transcript": ...,
               "end_of_turn": bool, "turn_is_formatted": true}
    server -> {"type": "Termination", "audio_duration_seconds": ...}

Connect-URL options: ``?sample_rate=<hz>`` (input resampled to 16 k),
``?speakers=true`` (finals carry a ``speaker`` label, live leader
clustering over turn ECAPA embeddings), ``?timestamps=true`` (finals
carry AAI-format ``words`` — text/start/end in session-absolute ms via
the ForcedAligner), ``?confidence=true`` (finals carry a (0, 1]
``confidence`` — exp of the mean chosen-token log-prob; decoded through
the solo scored graph).

so ``AssemblyAIStreamingEvaluator(base_url="ws://host:port/ws")`` evaluates
THIS server with zero changes — the eval harness and the serving stack meet
in the middle.

Endpointing runs on the same frame grid as the VAD (HOP=256 => 16 ms): a turn
opens after ``start_frames`` consecutive speech frames, closes after
``end_silence_frames`` of trailing silence, and is force-closed at
``max_turn_s`` so turn audio always fits the 30 s encoder window.  The VAD
net is causal (left-padded convs + forward GRU, vad.py:113-137) and runs
incrementally on the host (:class:`tiny_audio_tpu.vad.StreamingVad`): each
new chunk is scored once with carried conv/GRU state, O(new audio) per feed
and no accelerator dispatch, so endpointing never contends with decoding.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from tiny_audio_tpu.vad import HOP, SAMPLE_RATE, WIN

# ------------------------------------------------------------------ endpointer


@dataclass
class EndpointerConfig:
    """Frame counts are on the VAD grid: HOP/SAMPLE_RATE = 16 ms per frame."""

    start_frames: int = 8          # ~128 ms of speech opens a turn
    end_silence_frames: int = 40   # ~640 ms of silence closes it
    pre_roll_frames: int = 12      # ~192 ms kept before the detected onset
    hangover_frames: int = 12      # ~192 ms kept after the last speech frame
    max_turn_s: float = 28.0       # force-close before the 30 s encoder cap
    update_samples: int = 4096     # rescan cadence (~256 ms of new audio)
    idle_tail_s: float = 1.0       # silence kept while waiting for an onset


class TurnEndpointer:
    """Online speech/turn segmentation over a growing sample buffer.

    Pure state machine around an injected ``vad_fn`` ([n] float32 samples ->
    [n // HOP] bool decisions), so tests can drive it with a deterministic
    oracle and the server can plug in :func:`tiny_audio_tpu.vad.frame_vad_auto`.

    :meth:`feed` returns a list of events::

        ("start",)                  a turn opened
        ("final", audio, start)     a turn closed; ``audio`` is the float32
                                    turn clip, ``start`` its first sample's
                                    session-absolute offset (for the wire
                                    protocol's ms word timestamps)

    Partial-transcript cadence is the caller's business (it depends on TPU
    lock availability); the endpointer only segments.
    """

    def __init__(self, vad_fn: Optional[Callable[[np.ndarray], np.ndarray]],
                 config: Optional[EndpointerConfig] = None,
                 vad_stream=None):
        if (vad_fn is None) == (vad_stream is None):
            raise ValueError("pass exactly one of vad_fn / vad_stream")
        self.vad_fn = vad_fn
        # Streaming mode (vad.StreamingVad): decisions accumulate
        # incrementally in self._dec (aligned with buf's frame grid; every
        # trim below is hop-aligned) — O(new audio) per feed, where batch
        # mode re-scores the whole buffer every scan.
        self.vad_stream = vad_stream
        self._dec = np.zeros(0, bool)
        self.cfg = config or EndpointerConfig()
        self.buf = np.zeros(0, np.float32)
        self.turn_open = False
        self._since_scan = 0
        self._fed = 0  # total samples ever fed: buf starts at _fed - len(buf)

    # Samples of the current (open) turn so far — what a partial transcribes.
    @property
    def turn_audio(self) -> np.ndarray:
        return self.buf

    def feed(self, samples: np.ndarray) -> list[tuple]:
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._fed += samples.size
        self.buf = np.concatenate([self.buf, samples]) if self.buf.size else samples
        if self.vad_stream is not None and samples.size:
            new = self.vad_stream.feed(samples)
            if new.size:
                self._dec = np.concatenate([self._dec, new])
        self._since_scan += samples.size
        if self._since_scan < self.cfg.update_samples:
            return []
        self._since_scan = 0
        return self._scan()

    def flush(self) -> list[tuple]:
        """End of stream: close any open turn on whatever audio remains."""
        if self.vad_stream is not None and self.buf.size >= HOP:
            # complete the final analysis window so trailing frames score
            new = self.vad_stream.feed(np.zeros(WIN - HOP, np.float32))
            if new.size:
                self._dec = np.concatenate([self._dec, new])
        events = self._scan() if self.buf.size >= HOP else []
        if self.turn_open:
            events.append(("final", self.buf, self._buf_start()))
            self._clear()
        return events

    def force_endpoint(self) -> list[tuple]:
        """Client-requested turn close (AAI ``ForceEndpoint``)."""
        if not self.turn_open:
            return []
        audio, start = self.buf, self._buf_start()
        self._clear()
        return [("final", audio, start)]

    # ------------------------------------------------------------- internals

    def _buf_start(self) -> int:
        """Session-absolute sample offset of ``buf[0]``."""
        return self._fed - self.buf.size

    def _clear(self) -> None:
        """Drop all buffered state (turn closed on the full buffer)."""
        self.buf = np.zeros(0, np.float32)
        self.turn_open = False
        self._dec = np.zeros(0, bool)
        if self.vad_stream is not None:
            # conv/GRU context resets at the hard boundary (training clips
            # start cold too); the running level estimate is kept
            self.vad_stream.reset(keep_level=True)

    def _trim(self, frames: int) -> None:
        """Drop ``frames`` whole VAD frames from the buffer front
        (hop-aligned, so streaming decisions stay on the same grid)."""
        if frames <= 0:
            return
        self.buf = self.buf[frames * HOP:]
        self._dec = self._dec[frames:]

    def _scan(self) -> list[tuple]:
        cfg = self.cfg
        if self.vad_stream is not None:
            decisions = self._dec
        else:
            n_frames = self.buf.size // HOP
            decisions = (np.asarray(self.vad_fn(self.buf), bool)[:n_frames]
                         if n_frames else np.zeros(0, bool))
        if decisions.size == 0:
            return []
        events: list[tuple] = []

        if not self.turn_open:
            onset = self._find_onset(decisions)
            if onset is None:
                # Bound idle memory: keep only enough tail to still catch an
                # onset that straddles the next chunk boundary.
                keep_frames = int(cfg.idle_tail_s * SAMPLE_RATE) // HOP
                self._trim(self.buf.size // HOP - keep_frames)
                return events
            self.turn_open = True
            self._trim(max(0, onset - cfg.pre_roll_frames))
            decisions = self._dec if self.vad_stream is not None \
                else decisions[max(0, onset - cfg.pre_roll_frames):]
            events.append(("start",))

        speech_idx = np.flatnonzero(decisions)
        last_speech = int(speech_idx[-1]) if speech_idx.size else -1
        trailing = decisions.size - 1 - last_speech
        start = self._buf_start()
        if trailing >= cfg.end_silence_frames:
            cut_frames = last_speech + 1 + cfg.hangover_frames
            if cut_frames * HOP >= self.buf.size:
                events.append(("final", self.buf, start))
                self._clear()
            else:
                events.append(("final", self.buf[:cut_frames * HOP], start))
                self._trim(cut_frames)
                self.turn_open = False
        elif self.buf.size >= int(cfg.max_turn_s * SAMPLE_RATE):
            events.append(("final", self.buf, start))
            self._clear()
        return events

    def _find_onset(self, decisions: np.ndarray) -> Optional[int]:
        """First index where ``start_frames`` consecutive frames are speech."""
        k = self.cfg.start_frames
        if decisions.size < k:
            return None
        runs = np.convolve(decisions.astype(np.int32), np.ones(k, np.int32),
                           mode="valid")
        hits = np.flatnonzero(runs >= k)
        return int(hits[0]) if hits.size else None


# -------------------------------------------------------------- live speakers


class OnlineSpeakerTracker:
    """Leader clustering over turn-level ECAPA embeddings.

    The offline diarizer clusters all windows jointly (spectral,
    diarization.py:454) — a live session can't wait for the whole
    conversation, so each finalized turn greedily joins its closest
    centroid (cosine >= ``threshold``) or founds a new speaker.
    Calibration from the offline clusterer's measured margins
    (diarization.py:505-510): same-voice centroids sit at >=0.7 cosine even
    on the synthetic embedder tier while distinct voices measure ~0.13, so
    0.5 splits the gap.  Centroids are running means in the unnormalized
    space, re-normalized per comparison.
    """

    def __init__(self, threshold: float = 0.5, max_speakers: int = 10):
        self.threshold = threshold
        self.max_speakers = max_speakers
        self._sums: list[np.ndarray] = []
        self._counts: list[int] = []

    def assign(self, emb: np.ndarray) -> int:
        emb = np.asarray(emb, np.float32)
        emb = emb / max(float(np.linalg.norm(emb)), 1e-8)
        if self._sums:
            cents = np.stack([s / c for s, c in
                              zip(self._sums, self._counts)])
            cents /= np.maximum(
                np.linalg.norm(cents, axis=1, keepdims=True), 1e-8
            )
            sims = cents @ emb
            best = int(np.argmax(sims))
            if (sims[best] >= self.threshold
                    or len(self._sums) >= self.max_speakers):
                self._sums[best] += emb
                self._counts[best] += 1
                return best
        self._sums.append(emb.copy())
        self._counts.append(1)
        return len(self._sums) - 1


def turn_embedding(audio: np.ndarray) -> Optional[np.ndarray]:
    """Mean of window-level ECAPA embeddings over the turn clip, or None
    for clips too short to window.  Caller holds the TPU lock."""
    from tiny_audio_tpu.diarization import EcapaEmbedder, sliding_windows

    windows, _ = sliding_windows(
        audio, [(0.0, audio.size / SAMPLE_RATE)]
    )
    if windows.shape[0] == 0:
        return None
    embs = EcapaEmbedder.get().embed_windows(windows)
    m = embs.mean(axis=0)
    return m / max(float(np.linalg.norm(m)), 1e-8)


# ---------------------------------------------------------------------- server


class RealtimeServer:
    """Threaded realtime transcription server over a warmed pipeline.

    One connection = one session = one thread (``websockets.sync`` spawns a
    handler thread per client, matching the repo's ``ThreadingHTTPServer``
    style).  TPU work from all sessions serializes on ``lock`` — pass the
    HTTP server's batcher lock to co-host both on one chip.

    With a ``batcher`` (:class:`tiny_audio_tpu.batching.DynamicBatcher`),
    turn decodes from concurrent sessions coalesce into ONE batched
    generate instead of serializing: lock-serialized batch-1 decodes cap
    turn throughput near 3/s, while a 16-row batch decodes in ~0.6 s —
    the difference between a demo server and production session counts.
    Finals always submit (blocking: the turn is closed and ordering with
    its own partials matters); partials submit ASYNCHRONOUSLY — at most
    one in flight per session, delivered from the batcher thread when
    the batch round resolves, dropped if their turn closed meanwhile.
    Blocking the receive loop on partial futures instead was measured at
    13.1 s p50 endpoint latency under a 16-session burst (sessions fell
    behind real time, so endpointing itself happened late); the async
    path keeps chunk processing real-time and coalesces all sessions'
    partials into one batched decode (docs/performance.md burst table).

    Partials are best-effort: emitted at most every ``partial_every_s``
    and only when no earlier partial is still in flight (solo mode: only
    when the chip lock is free), so a busy chip degrades to final-only
    turns instead of queueing stale partial work.
    """

    def __init__(self, pipe, host: str = "0.0.0.0", port: int = 8765,
                 lock: Optional[threading.Lock] = None,
                 partial_every_s: float = 1.0,
                 endpointer_config: Optional[EndpointerConfig] = None,
                 vad_fn: Optional[Callable] = None,
                 batcher=None):
        self.pipe = pipe
        self.host, self._port = host, port
        self.batcher = batcher
        if lock is None and batcher is not None:
            lock = batcher.lock
        self.lock = lock if lock is not None else threading.Lock()
        self.partial_every_s = partial_every_s
        self.ep_config = endpointer_config or EndpointerConfig()
        # Injected vad_fn (tests / custom oracles) runs in batch mode; the
        # default uses the trained VAD incrementally on the HOST
        # (vad.StreamingVad: numpy, O(new audio), no XLA dispatch — batch
        # re-scoring of a growing buffer recompiled an eager kernel per
        # shape through the TPU tunnel, ~200 s endpoint latency), falling
        # back to the batch heuristic when no weights are present.
        self.vad_fn = vad_fn
        if vad_fn is None:
            from tiny_audio_tpu.vad import StreamingVad, frame_vad_auto

            if StreamingVad.make() is None:
                self.vad_fn = lambda a: frame_vad_auto(a)[0]  # noqa: E731
        self._server = None
        self._thread: Optional[threading.Thread] = None
        self._active = 0  # live websocket sessions (ops gauge)
        self._active_lock = threading.Lock()

    def active_sessions(self) -> int:
        """Currently connected sessions (exported to /metrics when
        co-hosted with the HTTP server)."""
        with self._active_lock:
            return self._active

    def _make_endpointer(self) -> TurnEndpointer:
        if self.vad_fn is not None:
            return TurnEndpointer(self.vad_fn, self.ep_config)
        from tiny_audio_tpu.vad import StreamingVad

        return TurnEndpointer(None, self.ep_config,
                              vad_stream=StreamingVad.make())

    # ------------------------------------------------------------- lifecycle

    def start(self) -> "RealtimeServer":
        from websockets.sync.server import serve as ws_serve

        # ping_interval=None: a cold XLA compile GIL-starves this process
        # for minutes, during which the websockets background thread can't
        # answer keepalive pings — the library would then kill healthy
        # sessions with 1011.  Session end is protocol-level (Terminate),
        # and dead sockets surface as TCP errors on the next send.
        self._server = ws_serve(self._handle, self.host, self._port,
                                ping_interval=None)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        return self._server.socket.getsockname()[1]

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------ connection

    def _handle(self, ws) -> None:
        with self._active_lock:
            self._active += 1
        try:
            self._handle_session(ws)
        finally:
            with self._active_lock:
                self._active -= 1

    def _handle_session(self, ws) -> None:
        from websockets.exceptions import ConnectionClosed

        sample_rate = 16000
        tracker = None
        timestamps = False
        confidence = False
        try:  # ?sample_rate=...&speakers=...&timestamps=...&confidence=...
            from urllib.parse import parse_qs, urlparse

            q = parse_qs(urlparse(ws.request.path).query)
            sample_rate = int(q.get("sample_rate", ["16000"])[0])
            if not 4000 <= sample_rate <= 192000:
                sample_rate = 16000  # 0/negative would divide-by-zero in resample
            if q.get("speakers", ["false"])[0].lower() in ("true", "1"):
                tracker = OnlineSpeakerTracker()
            if q.get("timestamps", ["false"])[0].lower() in ("true", "1"):
                timestamps = True
            if q.get("confidence", ["false"])[0].lower() in ("true", "1"):
                confidence = True
        except Exception:
            pass

        ws.send(json.dumps({
            "type": "Begin", "id": str(uuid.uuid4()),
            "expires_at": int(time.time()) + 3600,
        }))

        ep = self._make_endpointer()
        turn_order = 0
        total_samples = 0
        t0 = time.time()
        last_partial = 0.0
        terminated = False
        # Per-session async-partial state: "inflight" throttles to one
        # pending partial; "gen" bumps when a turn closes so a partial
        # resolving after its turn's final is dropped, not sent stale.
        sess = {"inflight": False, "gen": 0}

        try:
            for msg in ws:
                if isinstance(msg, (bytes, bytearray)):
                    audio = self._decode_pcm(msg, sample_rate)
                    total_samples += audio.size
                    turn_order = self._dispatch(
                        ws, ep.feed(audio), turn_order, tracker, timestamps,
                        confidence, sess,
                    )
                    if (
                        ep.turn_open
                        and time.time() - last_partial >= self.partial_every_s
                        and ep.turn_audio.size >= SAMPLE_RATE // 4
                    ):
                        if self.batcher is not None:
                            if self._submit_partial_async(
                                ws, ep.turn_audio, turn_order, sess
                            ):
                                last_partial = time.time()
                        else:
                            text = self._transcribe(
                                ep.turn_audio, blocking=False
                            )
                            if text is not None:
                                last_partial = time.time()
                                ws.send(json.dumps({
                                    "type": "Turn",
                                    "turn_order": turn_order,
                                    "transcript": text,
                                    "end_of_turn": False,
                                    "turn_is_formatted": False,
                                }))
                    continue
                try:
                    cmd = json.loads(msg)
                except (TypeError, ValueError):
                    continue
                if not isinstance(cmd, dict):
                    continue  # valid JSON but not a command (e.g. a list)
                if cmd.get("type") == "ForceEndpoint":
                    turn_order = self._dispatch(
                        ws, ep.force_endpoint(), turn_order, tracker,
                        timestamps, confidence, sess,
                    )
                elif cmd.get("type") == "Terminate":
                    turn_order = self._dispatch(
                        ws, ep.flush(), turn_order, tracker, timestamps,
                        confidence, sess,
                    )
                    ws.send(json.dumps({
                        "type": "Termination",
                        "audio_duration_seconds": total_samples / SAMPLE_RATE,
                        "session_duration_seconds": time.time() - t0,
                    }))
                    terminated = True
                    break
        except ConnectionClosed:
            pass
        finally:
            if not terminated:
                # client vanished mid-turn: nothing to send, just drop state
                ep.buf = np.zeros(0, np.float32)

    def _dispatch(self, ws, events: list[tuple], turn_order: int,
                  tracker: Optional[OnlineSpeakerTracker] = None,
                  timestamps: bool = False,
                  confidence: bool = False,
                  sess: Optional[dict] = None) -> int:
        for ev in events:
            if ev[0] != "final":
                continue
            if sess is not None:
                # Invalidate any in-flight async partial for this turn
                # BEFORE the final decodes: a partial resolving during
                # (or after) the final must be dropped, not sent stale.
                sess["gen"] += 1
            audio = ev[1]
            turn_start = ev[2] if len(ev) > 2 else 0
            # sub-150 ms turns are VAD flicker; report them empty rather
            # than spending a decode on noise
            text, conf = "", None
            if audio.size >= int(0.15 * SAMPLE_RATE):
                if confidence:
                    text, conf = self._transcribe_scored(audio)
                else:
                    text = self._transcribe(audio, blocking=True) or ""
            payload = {
                "type": "Turn", "turn_order": turn_order,
                "transcript": text, "end_of_turn": True,
                "turn_is_formatted": True,
            }
            if conf is not None:
                payload["confidence"] = conf
            if timestamps and text:
                payload["words"] = self._align_words(audio, text, turn_start)
            if tracker is not None and audio.size >= SAMPLE_RATE // 2:
                try:
                    with self.lock:  # ECAPA forward is TPU work
                        emb = turn_embedding(audio)
                    if emb is not None:
                        payload["speaker"] = (
                            f"SPEAKER_{tracker.assign(emb):02d}"
                        )
                except Exception:
                    pass  # attribution is best-effort; the turn still ships
            ws.send(json.dumps(payload))
            turn_order += 1
        return turn_order

    def _align_words(self, audio: np.ndarray, text: str,
                     turn_start: int) -> list[dict]:
        """AAI-v3-format word timestamps for a finalized turn: ``text`` /
        ``start`` / ``end`` in session-absolute milliseconds (the shape
        ``eval.evaluators.alignment.assemblyai_words`` parses).  Alignment
        is TPU work (jitted wav2vec2 forward) — runs under the lock."""
        from tiny_audio_tpu.alignment import ForcedAligner

        try:
            with self.lock:
                words = ForcedAligner.align(audio, text)
        except Exception:
            return []  # timestamps are best-effort; the turn still ships
        base_ms = turn_start * 1000.0 / SAMPLE_RATE
        out = []
        for w in words:
            entry = {
                "text": w["word"],
                "start": int(round(base_ms + w["start"] * 1000.0)),
                "end": int(round(base_ms + w["end"] * 1000.0)),
                "word_is_final": True,
            }
            if w.get("fallback"):  # weightless aligner: uniform spread
                entry["fallback"] = True
            out.append(entry)
        return out

    def _transcribe(self, audio: np.ndarray,
                    blocking: bool) -> Optional[str]:
        if self.batcher is not None:
            return self._transcribe_batched(audio, blocking)
        if not self.lock.acquire(blocking=blocking):
            return None  # partial path: chip busy, skip this round
        try:
            out = self.pipe({"array": np.asarray(audio, np.float32),
                             "sampling_rate": SAMPLE_RATE})
            return out.get("text", "")
        except Exception:  # keep the session alive on a bad clip
            return "" if blocking else None
        finally:
            self.lock.release()

    def _transcribe_scored(self, audio: np.ndarray) -> tuple[str, Optional[float]]:
        """Final-turn decode WITH per-turn confidence (?confidence=true):
        always the solo scored graph under the lock — the batcher's rows
        share one unscored generate, so scored finals bypass it (they
        still serialize on the same lock when co-hosted)."""
        try:
            with self.lock:
                out = self.pipe({"array": np.asarray(audio, np.float32),
                                 "sampling_rate": SAMPLE_RATE},
                                return_confidence=True)
            return out.get("text", ""), out.get("confidence")
        except Exception:  # keep the session alive on a bad clip
            return "", None

    def _transcribe_batched(self, audio: np.ndarray,
                            blocking: bool) -> Optional[str]:
        """Coalesce this turn's decode with other sessions' through the
        dynamic batcher.  Finals always queue; partials only when the
        queue is idle (stale partial work must not delay finals)."""
        from tiny_audio_tpu.batching import BacklogFull

        if not blocking and self.batcher.pending() > 0:
            return None
        try:
            fut = self.batcher.submit(np.asarray(audio, np.float32))
            return fut.result(timeout=300)
        except BacklogFull:
            return "" if blocking else None
        except Exception:  # keep the session alive on a bad clip
            return "" if blocking else None

    def _submit_partial_async(self, ws, audio: np.ndarray,
                              turn_order: int, sess: dict) -> bool:
        """Batcher-mode partial WITHOUT blocking the receive loop.

        Blocking the session thread on ``fut.result()`` for the full
        batch round (~1-2 s) made chunk processing fall behind real time
        under concurrent sessions, so endpointing itself happened late —
        measured 13.1 s p50 endpoint latency at a 16-session burst.
        Instead: submit, return immediately, deliver from the batcher
        thread.  One in-flight partial per session bounds queue growth
        at #sessions; all sessions' partials coalesce into ONE batched
        decode; a partial whose turn closed meanwhile (``sess["gen"]``
        bumped by ``_dispatch``) is dropped, never sent after its final.
        ``websockets.sync`` connections serialize sends internally, so
        delivery from the batcher thread is safe.

        Returns True when a partial was submitted (rate-limit clock
        advances), False when throttled or rejected.
        """
        if sess["inflight"]:
            return False
        from tiny_audio_tpu.batching import BacklogFull

        try:
            fut = self.batcher.submit(np.asarray(audio, np.float32))
        except (BacklogFull, RuntimeError):
            return False
        sess["inflight"] = True
        gen = sess["gen"]

        def deliver(f) -> None:
            sess["inflight"] = False
            try:
                text = f.result()
            except Exception:
                return  # batch failed/drained: partials are best-effort
            if sess["gen"] != gen:
                return  # turn already closed: stale
            # empty transcripts still ship (solo-path parity: early-turn
            # partials are often empty and clients key TTFB off them)
            try:
                ws.send(json.dumps({
                    "type": "Turn", "turn_order": turn_order,
                    "transcript": text, "end_of_turn": False,
                    "turn_is_formatted": False,
                }))
            except Exception:
                pass  # connection gone; the session thread tears down

        fut.add_done_callback(deliver)
        return True

    @staticmethod
    def _decode_pcm(raw: bytes, sample_rate: int) -> np.ndarray:
        audio = np.frombuffer(
            raw[: len(raw) - (len(raw) % 2)], "<i2"
        ).astype(np.float32) / 32768.0
        if sample_rate != SAMPLE_RATE and audio.size:
            from tiny_audio_tpu.utils.audio_io import resample

            audio = resample(audio, sample_rate, SAMPLE_RATE)
        return audio


# ------------------------------------------------------------------ entrypoint


def serve_realtime(model_path: str, host: str = "0.0.0.0", port: int = 8765,
                   warmup: bool = True, partial_every_s: float = 1.0) -> None:
    """CLI entry: load + warm the pipeline, run the websocket server."""
    from tiny_audio_tpu.handler import EndpointHandler

    handler = EndpointHandler(model_path)
    if warmup:
        print("[realtime] warming up (persistent compile cache makes "
              "restarts fast)...")
        total = handler.warmup(batched=False)
        print(f"[realtime] warmup done in {total:.1f}s")
    server = RealtimeServer(
        handler.pipe, host=host, port=port, partial_every_s=partial_every_s
    ).start()
    print(f"[realtime] listening on ws://{host}:{server.port} "
          "(PCM16 in, Turn events out)")
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.shutdown()
