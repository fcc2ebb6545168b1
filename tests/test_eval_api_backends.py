"""API-backend diarization/alignment extraction against mock vendor responses
(the reference's test style, e.g. ``/root/reference/tests/test_eval_deepgram.py``)."""

import numpy as np
import pytest

from tiny_audio_tpu.eval.evaluators.alignment import (
    assemblyai_words,
    deepgram_words,
    elevenlabs_words,
    make_alignment_evaluator,
)
from tiny_audio_tpu.eval.evaluators.diarization import (
    assemblyai_segments,
    deepgram_segments,
    elevenlabs_segments,
    make_diarization_evaluator,
)

ASSEMBLYAI_RESPONSE = {
    "status": "completed",
    "text": "hello world goodbye",
    "utterances": [
        {"speaker": "A", "start": 0, "end": 2100},
        {"speaker": "B", "start": 2500, "end": 5000},
    ],
    "words": [
        {"text": "hello", "start": 0, "end": 480},
        {"text": "world", "start": 520, "end": 1000},
        {"text": "goodbye", "start": 2500, "end": 3200},
    ],
}

DEEPGRAM_RESPONSE = {
    "results": {
        "utterances": [
            {"speaker": 0, "start": 0.0, "end": 2.1, "transcript": "hello world"},
            {"speaker": 1, "start": 2.5, "end": 5.0, "transcript": "goodbye"},
        ],
        "channels": [
            {
                "alternatives": [
                    {
                        "transcript": "hello world goodbye",
                        "words": [
                            {"word": "hello", "start": 0.0, "end": 0.48},
                            {"word": "world", "start": 0.52, "end": 1.0},
                            {"word": "goodbye", "start": 2.5, "end": 3.2},
                        ],
                    }
                ]
            }
        ],
    }
}

ELEVENLABS_RESPONSE = {
    "text": "hello world goodbye",
    "words": [
        {"text": "hello", "start": 0.0, "end": 0.48, "type": "word",
         "speaker_id": "speaker_0"},
        {"text": " ", "start": 0.48, "end": 0.52, "type": "spacing",
         "speaker_id": "speaker_0"},
        {"text": "world", "start": 0.52, "end": 1.0, "type": "word",
         "speaker_id": "speaker_0"},
        {"text": "goodbye", "start": 2.5, "end": 3.2, "type": "word",
         "speaker_id": "speaker_1"},
    ],
}


class TestDiarizationExtractors:
    def test_assemblyai(self):
        segs = assemblyai_segments(ASSEMBLYAI_RESPONSE)
        assert segs == [
            {"speaker": "A", "start": 0.0, "end": 2.1},
            {"speaker": "B", "start": 2.5, "end": 5.0},
        ]

    def test_deepgram(self):
        segs = deepgram_segments(DEEPGRAM_RESPONSE)
        assert segs == [
            {"speaker": "SPEAKER_0", "start": 0.0, "end": 2.1},
            {"speaker": "SPEAKER_1", "start": 2.5, "end": 5.0},
        ]

    def test_elevenlabs_groups_consecutive_words(self):
        segs = elevenlabs_segments(ELEVENLABS_RESPONSE)
        assert segs == [
            {"speaker": "SPEAKER_speaker_0", "start": 0.0, "end": 1.0},
            {"speaker": "SPEAKER_speaker_1", "start": 2.5, "end": 3.2},
        ]

    def test_empty_responses(self):
        assert assemblyai_segments({}) == []
        assert deepgram_segments({}) == []
        assert elevenlabs_segments({"words": [{"type": "word"}]}) == []


class TestAlignmentExtractors:
    def test_assemblyai_ms_to_s(self):
        words = assemblyai_words(ASSEMBLYAI_RESPONSE)
        assert words[0] == {"word": "hello", "start": 0.0, "end": 0.48}
        assert words[2]["start"] == 2.5

    def test_deepgram(self):
        words = deepgram_words(DEEPGRAM_RESPONSE)
        assert [w["word"] for w in words] == ["hello", "world", "goodbye"]

    def test_elevenlabs_skips_spacing(self):
        words = elevenlabs_words(ELEVENLABS_RESPONSE)
        assert [w["word"] for w in words] == ["hello", "world", "goodbye"]

    def test_empty(self):
        assert deepgram_words({}) == []
        assert assemblyai_words({}) == []


class TestBackendWiring:
    def test_key_gated_eagerly(self, monkeypatch):
        """A missing API key fails at CONSTRUCTION — raising per-sample
        would be swallowed by the eval loop and report ~100% DER as a
        'successful' run."""
        monkeypatch.delenv("DEEPGRAM_API_KEY", raising=False)
        with pytest.raises(RuntimeError, match="DEEPGRAM_API_KEY"):
            make_diarization_evaluator("deepgram")
        monkeypatch.setenv("DEEPGRAM_API_KEY", "k")
        ev = make_diarization_evaluator("deepgram")
        assert ev.model_name == "deepgram-diarization"

    def test_unknown_backend_raises(self):
        # must fail at CONSTRUCTION: a deferred per-sample error would be
        # swallowed by the eval loop and score every sample as empty
        with pytest.raises(ValueError, match="unsupported diarization"):
            make_diarization_evaluator("bogus")

    def test_unknown_alignment_backend_raises(self):
        from tiny_audio_tpu.eval.evaluators.alignment import (
            make_alignment_evaluator,
        )

        with pytest.raises(ValueError, match="unsupported alignment"):
            make_alignment_evaluator("endpoint")

    def test_mocked_transport_end_to_end(self, monkeypatch):
        """Full evaluate() loop against a mocked vendor transport."""
        from tiny_audio_tpu.eval.evaluators import api

        monkeypatch.setenv("DEEPGRAM_API_KEY", "test-key")
        monkeypatch.setattr(
            api, "deepgram_transcribe",
            lambda wav, key, **kw: DEEPGRAM_RESPONSE,
        )
        ev = make_diarization_evaluator("deepgram")
        dataset = [
            {
                "audio": {"array": np.zeros(16000 * 5, np.float32),
                          "sampling_rate": 16000},
                "speakers": [
                    {"speaker": "X", "start": 0.0, "end": 2.1},
                    {"speaker": "Y", "start": 2.5, "end": 5.0},
                ],
            }
        ]
        rows, metrics = ev.evaluate(dataset, verbose=False)
        assert metrics["num_samples"] == 1
        assert metrics["errors"] == 0
        # hypothesis matches reference up to label permutation -> DER ~ 0
        assert metrics["corpus_der"] < 1.0

    def test_alignment_mocked_transport(self, monkeypatch):
        from tiny_audio_tpu.eval.evaluators import api

        monkeypatch.setenv("ASSEMBLYAI_API_KEY", "test-key")
        monkeypatch.setattr(
            api, "assemblyai_transcribe",
            lambda wav, key, **kw: ASSEMBLYAI_RESPONSE,
        )
        ev = make_alignment_evaluator("assemblyai")
        dataset = [
            {
                "audio": {"array": np.zeros(16000 * 4, np.float32),
                          "sampling_rate": 16000},
                "words": [
                    {"word": "hello", "start": 0.0, "end": 0.5},
                    {"word": "world", "start": 0.5, "end": 1.0},
                    {"word": "goodbye", "start": 2.5, "end": 3.2},
                ],
            }
        ]
        rows, metrics = ev.evaluate(dataset, verbose=False)
        assert metrics["num_samples"] == 1
        assert metrics["errors"] == 0
        assert metrics["match_rate"] == 1.0
        assert metrics["median_abs_error_s"] <= 0.02


class TestAssemblyAITransport:
    """HTTP-level contract of assemblyai_transcribe against a fake requests
    layer: submit failures must raise an HTTP error (not KeyError), and a
    job stuck in processing must hit the poll deadline."""

    class _Resp:
        def __init__(self, payload, status=200):
            self._payload = payload
            self.status_code = status

        def json(self):
            return self._payload

        def raise_for_status(self):
            if self.status_code >= 400:
                raise RuntimeError(f"http {self.status_code}")

    def _patch_requests(self, monkeypatch, post_responses, get_payload):
        import sys
        import types

        calls = iter(post_responses)
        fake = types.SimpleNamespace(
            post=lambda *a, **k: next(calls),
            get=lambda *a, **k: self._Resp(get_payload),
        )
        monkeypatch.setitem(sys.modules, "requests", fake)

    def test_submit_error_raises_http_not_keyerror(self, monkeypatch):
        from tiny_audio_tpu.eval.evaluators.api import assemblyai_transcribe

        self._patch_requests(
            monkeypatch,
            post_responses=[
                self._Resp({"upload_url": "u"}),
                self._Resp({"error": "bad params"}, status=400),
            ],
            get_payload={},
        )
        with pytest.raises(RuntimeError, match="http 400"):
            assemblyai_transcribe(b"RIFF", "key")

    def test_stuck_job_hits_poll_deadline(self, monkeypatch):
        from tiny_audio_tpu.eval.evaluators.api import assemblyai_transcribe

        self._patch_requests(
            monkeypatch,
            post_responses=[
                self._Resp({"upload_url": "u"}),
                self._Resp({"id": "j1", "status": "queued"}),
            ],
            get_payload={"id": "j1", "status": "processing"},
        )
        with pytest.raises(TimeoutError, match="j1"):
            assemblyai_transcribe(b"RIFF", "key", poll_s=0.01,
                                  poll_timeout_s=0.05)
