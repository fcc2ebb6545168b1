"""Diarization: VAD, segment hysteresis, clustering, voting, word assignment.

Mirrors the reference test strategy (SURVEY.md §4): pure-function oracle
tests on synthetic signals/embeddings; the end-to-end path runs with the
random-weight embedder and is checked for structural contracts only.
"""

import numpy as np
import pytest

from tiny_audio_tpu.diarization import (
    EcapaEmbedder,
    LocalSpeakerDiarizer,
    SpeakerClusterer,
    SpeakerDiarizer,
    SpectralCluster,
    decisions_to_segments,
    frame_vad,
    sliding_windows,
)

SR = 16000


def _tone(duration_s, freq=220.0, amp=0.3):
    t = np.arange(int(duration_s * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _silence(duration_s, amp=1e-4):
    rng = np.random.default_rng(0)
    return (amp * rng.standard_normal(int(duration_s * SR))).astype(np.float32)


class TestVAD:
    def test_tone_vs_silence(self):
        audio = np.concatenate([_silence(1.0), _tone(1.0), _silence(1.0)])
        decisions = frame_vad(audio)
        frames_per_s = SR // 256
        mid = decisions[int(1.2 * frames_per_s) : int(1.8 * frames_per_s)]
        edges = np.concatenate(
            [decisions[: int(0.8 * frames_per_s)], decisions[-int(0.8 * frames_per_s) :]]
        )
        assert mid.mean() > 0.8
        assert edges.mean() < 0.2

    def test_empty(self):
        assert frame_vad(np.zeros(0)).shape == (0,)

    def test_segments_gap_fill(self):
        # two speech bursts 0.3 s apart -> merged (gap < 0.5 s)
        fps = SR // 256
        d = np.zeros(5 * fps, bool)
        d[fps : 2 * fps] = True
        d[int(2.3 * fps) : 3 * fps] = True
        segs = decisions_to_segments(d)
        assert len(segs) == 1

    def test_segments_no_merge_large_gap(self):
        fps = SR // 256
        d = np.zeros(6 * fps, bool)
        d[fps : 2 * fps] = True
        d[4 * fps : 5 * fps] = True
        segs = decisions_to_segments(d)
        assert len(segs) == 2

    def test_min_duration_drop(self):
        fps = SR // 256
        d = np.zeros(2 * fps, bool)
        d[fps : fps + 2] = True  # ~0.03 s < 0.05 s min
        assert decisions_to_segments(d) == []

    def test_padding_clamped(self):
        fps = SR // 256
        d = np.ones(fps, bool)
        (seg,) = decisions_to_segments(d)
        assert seg[0] == 0.0 and seg[1] <= 1.0


class TestWindows:
    def test_window_count_and_spans(self):
        audio = _tone(3.0)
        wins, spans = sliding_windows(audio, [(0.0, 3.0)])
        assert wins.shape[1] == int(0.75 * SR)
        assert len(spans) == len(wins)
        # step 0.15 s over 3 s -> ~ (3 - 0.75)/0.15 + 1 = 16 windows
        assert 14 <= len(wins) <= 17
        assert spans[0][0] == 0.0
        assert spans[-1][1] <= 3.0 + 1e-6

    def test_short_segment_padded(self):
        audio = _tone(0.5)
        wins, spans = sliding_windows(audio, [(0.0, 0.5)])
        assert len(wins) == 1
        assert wins.shape[1] == int(0.75 * SR)  # zero-padded


class TestSpectralCluster:
    def _blob_embeddings(self, k=3, per=20, dim=32, seed=0):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((k, dim)) * 3
        x = np.concatenate(
            [centers[i] + 0.1 * rng.standard_normal((per, dim)) for i in range(k)]
        )
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(np.float32), np.repeat(np.arange(k), per)

    @staticmethod
    def _cluster_accuracy(pred, true):
        """Best-permutation agreement (greedy, fine for small k)."""
        import itertools

        k = int(max(pred.max(), true.max())) + 1
        best = 0.0
        for perm in itertools.permutations(range(k)):
            mapped = np.array([perm[p] for p in pred])
            best = max(best, (mapped == true).mean())
        return best

    def test_oracle_count(self):
        x, true = self._blob_embeddings(k=3)
        labels = SpectralCluster()(x, num_speakers=3)
        assert len(np.unique(labels)) == 3
        assert self._cluster_accuracy(labels, true) > 0.95

    def test_eigengap_estimate(self):
        x, true = self._blob_embeddings(k=2, per=30)
        labels = SpectralCluster()(x)
        assert len(np.unique(labels)) == 2
        assert self._cluster_accuracy(labels, true) > 0.95

    def test_single_embedding(self):
        x = np.ones((1, 8), np.float32)
        assert SpectralCluster()(x).tolist() == [0]

    def test_nan_guard(self):
        x, _ = self._blob_embeddings(k=2)
        x[0] = np.nan
        labels = SpeakerClusterer(num_speakers=2)(x)
        assert len(labels) == len(x)
        assert np.isfinite(labels).all()

    def test_centroid_merge_collapses_identical(self):
        rng = np.random.default_rng(1)
        base = rng.standard_normal(16)
        x = np.stack([base + 0.01 * rng.standard_normal(16) for _ in range(20)])
        x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
        labels = SpeakerClusterer()(x)  # auto count: should merge to 1
        assert len(np.unique(labels)) == 1

    def test_labels_consecutive_from_zero(self):
        x, _ = self._blob_embeddings(k=3)
        labels = SpeakerClusterer(num_speakers=3)(x)
        assert set(np.unique(labels)) == {0, 1, 2}

    def test_ratio_gap_scale_invariant(self):
        """Scaling every affinity identically must not change the count —
        the property the unnormalized absolute eigengap lacked (over-split
        to 8 on spread-out synthetic-embedder affinities, VERDICT r3)."""
        x, true = self._blob_embeddings(k=3, per=25, seed=4)
        for spread in (0.1, 0.8):  # tight vs spread-out clusters
            noisy = x + spread * 0.3 * np.random.default_rng(0).standard_normal(
                x.shape
            ).astype(np.float32)
            noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
            labels = SpectralCluster()(noisy)
            assert len(np.unique(labels)) == 3, spread

    def test_split_recovers_connected_component_blindspot(self):
        """Two similar voices + one very distinct one: p-pruning leaves two
        exact graph components, the eigen-spectrum says k=2, and the split
        refinement must recover the third speaker."""
        rng = np.random.default_rng(7)
        a = rng.standard_normal(32)
        b = a + 1.4 * rng.standard_normal(32)  # moderately separated from a
        c = -a  # anti-correlated: prunes to its own component
        x = np.concatenate([
            center + 0.12 * rng.standard_normal((20, 32))
            for center in (a, b, c)
        ])
        x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
        true = np.repeat(np.arange(3), 20)
        labels = SpeakerClusterer()(x)
        assert len(np.unique(labels)) == 3
        assert self._cluster_accuracy(labels, true) > 0.9

    def test_split_does_not_shave_phantom_speakers(self):
        """A single tight voice cloud must never be split."""
        rng = np.random.default_rng(3)
        base = rng.standard_normal(32)
        x = np.stack([base + 0.4 * rng.standard_normal(32) for _ in range(40)])
        x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
        clusterer = SpeakerClusterer()
        labels = clusterer._split_mixed_clusters(x, np.zeros(40, np.int64))
        assert len(np.unique(labels)) == 1

    def test_split_respects_max_speakers(self):
        x, _ = self._blob_embeddings(k=4, per=15, seed=9)
        clusterer = SpeakerClusterer(max_speakers=2)
        labels = clusterer._split_mixed_clusters(x, np.zeros(60, np.int64))
        assert len(np.unique(labels)) <= 2


class TestEndToEnd:
    def test_diarize_structural(self):
        audio = np.concatenate(
            [_tone(1.0, 220), _silence(0.7), _tone(1.0, 440)]
        )
        segments = SpeakerDiarizer.diarize(audio, num_speakers=2)
        assert isinstance(segments, list)
        from tiny_audio_tpu.diarization import EcapaEmbedder
        from tiny_audio_tpu.vad import NeuralVAD

        tier = getattr(EcapaEmbedder.get(), "tier", "random")
        vad_trained = NeuralVAD.get() is not None
        for seg in segments:
            expect = {"speaker", "start", "end"}
            # random-init embedder => tagged fallback; synthetic-trained
            # tier => tagged with the embedder name; heuristic VAD adds
            # its own tag
            if tier == "random":
                expect.add("fallback")
                assert seg["fallback"] is True
            elif tier == "synthetic":
                expect.add("embedder")
                assert seg["embedder"] == "synthetic"
            if not vad_trained:
                expect.add("vad_fallback")
            assert set(seg) == expect
            assert seg["start"] < seg["end"]
            assert seg["speaker"].startswith("SPEAKER_")
        # monotonic, non-overlapping
        for a, b in zip(segments, segments[1:]):
            assert a["end"] <= b["start"] + 1e-6

    def test_silence_returns_empty(self):
        assert SpeakerDiarizer.diarize(_silence(2.0)) == []

    def test_single_window_single_speaker(self):
        audio = _tone(0.6)
        d = LocalSpeakerDiarizer()
        segs = d.diarize(audio)
        assert len(segs) <= 1

    def test_embedder_batched_shapes(self):
        from tiny_audio_tpu.models.ecapa import EcapaTDNN

        emb = EcapaEmbedder(module=EcapaTDNN(
            channels=(64, 64, 64, 64, 192), embed_dim=32,
            attention_channels=32, se_channels=16,
        ))
        assert emb.trained is False
        wins = np.random.default_rng(0).standard_normal((3, 12000)).astype(np.float32)
        out = emb.embed_windows(wins)
        assert out.shape == (3, 32)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)

    def test_embedder_empty(self):
        from tiny_audio_tpu.models.ecapa import EcapaTDNN

        emb = EcapaEmbedder(module=EcapaTDNN(
            channels=(64, 64, 64, 64, 192), embed_dim=32,
            attention_channels=32, se_channels=16,
        ))
        assert emb.embed_windows(np.zeros((0, 12000), np.float32)).shape == (0, 32)


class TestAssignWords:
    SEGMENTS = [
        {"speaker": "SPEAKER_00", "start": 0.0, "end": 2.0},
        {"speaker": "SPEAKER_01", "start": 2.5, "end": 5.0},
    ]

    def test_midpoint_containment(self):
        words = [{"word": "hi", "start": 0.5, "end": 1.0}]
        out = SpeakerDiarizer.assign_speakers_to_words(words, self.SEGMENTS)
        assert out[0]["speaker"] == "SPEAKER_00"

    def test_closest_fallback(self):
        words = [{"word": "gap", "start": 2.1, "end": 2.2}]  # midpoint in gap
        out = SpeakerDiarizer.assign_speakers_to_words(words, self.SEGMENTS)
        assert out[0]["speaker"] == "SPEAKER_00"

    def test_no_segments_yields_none_speaker(self):
        # schema stays uniform: every word carries a 'speaker' key even when
        # diarization found no segments (silent-ish clips)
        words = [{"word": "x", "start": 0.0, "end": 1.0}]
        out = SpeakerDiarizer.assign_speakers_to_words(words, [])
        assert out == [{"word": "x", "start": 0.0, "end": 1.0, "speaker": None}]

    def test_input_not_mutated(self):
        words = [{"word": "hi", "start": 0.5, "end": 1.0}]
        SpeakerDiarizer.assign_speakers_to_words(words, self.SEGMENTS)
        assert "speaker" not in words[0]
