"""VAD validation on formant-synthesized speech (VERDICT round-1 weak #3).

No real speech ships in this zero-egress environment, so the energy+flatness
VAD (replacing the reference's trained TEN-VAD,
``/root/reference/tiny_audio/diarization.py:361-407``) is validated against
source-filter synthetic speech (:mod:`tiny_audio_tpu.utils.speech_synth`):
glottal pulse train -> formant resonators + fricative noise, with an exact
sample-level ground-truth mask — across SNR, noise color, reverb, and level
conditions.  Frame-level F1 thresholds are set ~0.05 under measured values
(seed-stable; see docs/evaluation-and-deployment.md for the measured table).
"""

from __future__ import annotations

import numpy as np
import pytest

from tiny_audio_tpu.diarization import VAD_HOP, frame_vad
from tiny_audio_tpu.train.augmentation import _fft_convolve, _rms, synthetic_rir
from tiny_audio_tpu.utils.speech_synth import (
    mask_to_frames,
    synth_conversation,
    synth_utterance,
)


def _f1(audio: np.ndarray, mask: np.ndarray) -> tuple[float, float, float]:
    truth = mask_to_frames(mask, VAD_HOP)
    dec = frame_vad(audio)
    n = min(len(truth), len(dec))
    truth, dec = truth[:n], dec[:n]
    tp = float((dec & truth).sum())
    p = tp / max(float(dec.sum()), 1.0)
    r = tp / max(float(truth.sum()), 1.0)
    return p, r, 2 * p * r / max(p + r, 1e-9)


@pytest.fixture(scope="module")
def utterance():
    return synth_utterance(10.0, seed=2)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


class TestCleanAndLevels:
    def test_clean(self, utterance):
        audio, mask = utterance
        assert _f1(audio, mask)[2] >= 0.95

    def test_quiet_minus35_dbfs_peak(self):
        # the round-1 [-45, -25] dBFS threshold clamp scored F1 0.20 here
        audio, mask = synth_utterance(10.0, seed=6, level=0.018)
        assert _f1(audio, mask)[2] >= 0.95

    def test_quiet_minus45_dbfs_peak(self):
        audio, mask = synth_utterance(10.0, seed=7, level=0.006)
        assert _f1(audio, mask)[2] >= 0.90

    def test_speech_dominated_clip(self):
        # floor percentile lands inside speech; threshold must not reject it
        audio, mask = synth_utterance(10.0, seed=5, speech_fraction=0.92)
        assert _f1(audio, mask)[2] >= 0.85


class TestNoise:
    @pytest.mark.parametrize("snr_db,min_f1", [(10, 0.88), (5, 0.80), (0, 0.70)])
    def test_white_noise(self, utterance, snr_db, min_f1):
        audio, mask = utterance
        noise = np.random.default_rng(0).standard_normal(len(audio)).astype(np.float32)
        noise *= _rms(audio[mask]) / (10 ** (snr_db / 20)) / _rms(noise)
        p, r, f1 = _f1(audio + noise, mask)
        assert f1 >= min_f1, (p, r, f1)

    def test_pink_noise_10db(self, utterance):
        audio, mask = utterance
        w = np.random.default_rng(1).standard_normal(len(audio))
        spec = np.fft.rfft(w)
        freqs = np.fft.rfftfreq(len(w), 1 / 16000)
        spec[1:] /= np.sqrt(freqs[1:])
        spec[0] = 0
        pink = np.fft.irfft(spec, len(w)).astype(np.float32)
        pink *= _rms(audio[mask]) / (10 ** (10 / 20)) / _rms(pink)
        assert _f1(audio + pink, mask)[2] >= 0.90

    def test_noise_only_low_false_positives(self):
        noise = (np.random.default_rng(2).standard_normal(160000) * 0.01).astype(
            np.float32
        )
        assert frame_vad(noise).mean() <= 0.15


class TestReverb:
    def test_far_field_reverb(self, utterance):
        audio, mask = utterance
        rir = synthetic_rir(np.random.default_rng(3), duration_s=0.8, rt60_s=0.6)
        rev = _fft_convolve(audio, rir)[: len(audio)]
        rev = rev / (np.abs(rev).max() + 1e-9) * 0.25
        p, r, f1 = _f1(rev, mask)
        # reverb tails extend past the dry mask -> precision dips by design;
        # recall is what diarization windows need
        assert r >= 0.95 and f1 >= 0.82, (p, r, f1)

    def test_reverb_plus_noise(self, utterance):
        audio, mask = utterance
        rir = synthetic_rir(np.random.default_rng(3), duration_s=0.8, rt60_s=0.6)
        rev = _fft_convolve(audio, rir)[: len(audio)]
        rev = (rev / (np.abs(rev).max() + 1e-9) * 0.25).astype(np.float32)
        noise = np.random.default_rng(4).standard_normal(len(rev)).astype(np.float32)
        noise *= _rms(rev[mask]) / (10 ** (10 / 20)) / _rms(noise)
        assert _f1(rev + noise, mask)[2] >= 0.85


class TestSilence:
    def test_digital_silence(self):
        assert frame_vad(np.zeros(160000, np.float32)).sum() == 0

    def test_dither_floor(self):
        dither = (np.random.default_rng(1).standard_normal(160000) * 1e-4).astype(
            np.float32
        )
        assert frame_vad(dither).sum() == 0


class TestConversationPipeline:
    """End-to-end diarizer on synthetic two-speaker audio: VAD-driven
    segment coverage is checkable even though random-init ECAPA embeddings
    make the speaker LABELS arbitrary (results carry ``fallback: True``)."""

    def test_segment_coverage_and_fallback_tag(self):
        from tiny_audio_tpu.diarization import LocalSpeakerDiarizer

        audio, turns, mask = synth_conversation(12.0, n_speakers=2, seed=0)
        segments = LocalSpeakerDiarizer(num_speakers=2).diarize(audio)
        assert segments, "no segments on clearly voiced audio"
        from tiny_audio_tpu.diarization import EcapaEmbedder

        if getattr(EcapaEmbedder.get(), "tier", "random") == "random":
            assert all(s.get("fallback") for s in segments)
        else:  # synthetic-trained embedder shipped: tagged by name instead
            assert not any(s.get("fallback") for s in segments)

        grid = 0.01
        n = int(len(audio) / 16000 / grid)
        hyp = np.zeros(n, bool)
        for s in segments:
            hyp[int(s["start"] / grid): int(s["end"] / grid)] = True
        truth = np.zeros(n, bool)
        idx = (np.arange(n) * grid * 16000).astype(int)
        truth = mask[np.minimum(idx, len(mask) - 1)]
        covered = float((hyp & truth).sum()) / max(float(truth.sum()), 1.0)
        assert covered >= 0.90, covered


class TestNeuralVAD:
    """The trained VAD (tiny_audio_tpu/vad.py, weights checked in) must beat
    the heuristic exactly where the heuristic is weakest: 0 dB white noise
    and far-field reverb (VERDICT r2 #2).  Measured 2026-08-17 (train_vad.py
    evaluate()): mean F1 neural 0.978 vs heuristic 0.929; white 0 dB
    0.95-0.97 vs 0.76-0.78; far-field 0.946 vs 0.91-0.92."""

    @pytest.fixture(scope="class")
    def neural(self):
        from tiny_audio_tpu.vad import NeuralVAD

        model = NeuralVAD.get()
        if model is None:
            pytest.skip("no trained VAD weights checked in")
        return model

    def _grid_f1(self, neural, audio, mask):
        from tiny_audio_tpu.utils.speech_synth import mask_to_frames
        from tiny_audio_tpu.vad import HOP

        truth = mask_to_frames(mask, HOP)
        n = len(truth)

        def f1(pred):
            tp = float(np.sum(pred[:n] & truth))
            p = tp / max(float(np.sum(pred[:n])), 1.0)
            r = tp / max(float(np.sum(truth)), 1.0)
            return 2 * p * r / max(p + r, 1e-9)

        return f1(neural(audio)), f1(frame_vad(audio))

    def test_beats_heuristic_at_0db_white(self, neural):
        audio, mask = synth_utterance(8.0, seed=1001)
        rng = np.random.default_rng(0)
        sp_rms = np.sqrt(np.mean(audio[mask] ** 2))
        noisy = audio + rng.standard_normal(len(audio)).astype(np.float32) * sp_rms
        nf1, hf1 = self._grid_f1(neural, noisy, mask)
        assert nf1 >= 0.90, (nf1, hf1)
        assert nf1 >= hf1 + 0.05, (nf1, hf1)

    def test_beats_heuristic_far_field(self, neural):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "train_vad",
            Path(__file__).resolve().parents[1] / "scripts" / "train_vad.py",
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)

        audio, mask = synth_utterance(8.0, seed=1002)
        rng = np.random.default_rng(1)
        far = m.apply_rir(audio, m.synth_rir(rng, rt60=0.8, drr_db=-4.0))
        far += rng.standard_normal(len(far)).astype(np.float32) * (
            np.sqrt(np.mean(far ** 2)) / (10 ** (15 / 20))
        )
        nf1, hf1 = self._grid_f1(neural, far, mask)
        assert nf1 >= 0.88, (nf1, hf1)
        assert nf1 >= hf1 - 0.02, (nf1, hf1)  # at worst tied

    def test_clean_parity(self, neural):
        audio, mask = synth_utterance(8.0, seed=1001)
        nf1, hf1 = self._grid_f1(neural, audio, mask)
        assert nf1 >= 0.97, (nf1, hf1)

    def test_diarizer_uses_it_by_default(self, neural):
        from tiny_audio_tpu.vad import frame_vad_auto

        audio, _ = synth_utterance(4.0, seed=5)
        decisions, trained = frame_vad_auto(audio)
        assert trained is True
        assert decisions.any()


class TestStreamingVad:
    """Host-side incremental inference (vad.StreamingVad) must match the
    batch scorer: exact-net parity on identical inputs (the oracle
    pattern), high decision agreement end-to-end despite the running-mean
    normalization, and the same F1 margins on the hard conditions."""

    @pytest.fixture(scope="class")
    def pair(self):
        from tiny_audio_tpu.vad import NeuralVAD, StreamingVad, _np_params

        model = NeuralVAD.get()
        if model is None:
            pytest.skip("no trained VAD weights checked in")
        return model, _np_params(model.params)

    def test_numpy_net_matches_flax(self, pair):
        from tiny_audio_tpu.vad import N_MELS, np_vadnet_forward

        model, p = pair
        x = np.random.default_rng(0).normal(
            size=(150, N_MELS)
        ).astype(np.float32)
        flax_logits = np.asarray(model.net.apply({"params": model.params},
                                                 x[None]))[0]
        np.testing.assert_allclose(np_vadnet_forward(p, x), flax_logits,
                                   atol=1e-4)

    def test_numpy_features_match_jnp(self, pair):
        from tiny_audio_tpu.vad import vad_logmel, vad_logmel_np

        audio, _ = synth_utterance(4.0, seed=7)
        f_np = vad_logmel_np(audio)
        f_j = np.asarray(vad_logmel(audio[None]))[0]
        np.testing.assert_allclose(f_np, f_j, atol=5e-3)

    def test_chunked_decisions_agree_with_batch(self, pair):
        from tiny_audio_tpu.vad import StreamingVad

        model, p = pair
        audio, _ = synth_utterance(6.0, seed=11)
        audio = np.concatenate([np.zeros(8000, np.float32), audio,
                                np.zeros(8000, np.float32)])
        batch = model(audio)
        sv = StreamingVad(p)
        chunks = [sv.feed(audio[i: i + 1600])
                  for i in range(0, len(audio), 1600)]
        stream = np.concatenate(chunks)
        n = min(len(batch), len(stream))
        assert n >= len(batch) - 2  # at most the incomplete-window lag
        assert float((batch[:n] == stream[:n]).mean()) >= 0.97

    def test_chunk_size_invariance(self, pair):
        """Identical decisions regardless of how the audio is chunked."""
        from tiny_audio_tpu.vad import StreamingVad

        _, p = pair
        audio, _ = synth_utterance(3.0, seed=13)
        outs = []
        for step in (160, 1600, 7000):
            sv = StreamingVad(p)
            outs.append(np.concatenate(
                [sv.feed(audio[i: i + step])
                 for i in range(0, len(audio), step)]
            ))
        n = min(map(len, outs))
        for other in outs[1:]:
            np.testing.assert_array_equal(outs[0][:n], other[:n])

    def test_streaming_f1_at_0db_white(self, pair):
        from tiny_audio_tpu.utils.speech_synth import mask_to_frames
        from tiny_audio_tpu.vad import HOP, StreamingVad

        _, p = pair
        audio, mask = synth_utterance(8.0, seed=1001)
        rng = np.random.default_rng(0)
        sp_rms = np.sqrt(np.mean(audio[mask] ** 2))
        noisy = audio + rng.standard_normal(
            len(audio)).astype(np.float32) * sp_rms
        sv = StreamingVad(p)
        pred = np.concatenate([sv.feed(noisy[i: i + 1600])
                               for i in range(0, len(noisy), 1600)])
        truth = mask_to_frames(mask, HOP)
        n = min(len(pred), len(truth))
        tp = float(np.sum(pred[:n] & truth[:n]))
        prec = tp / max(float(np.sum(pred[:n])), 1.0)
        rec = tp / max(float(np.sum(truth[:n])), 1.0)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        assert f1 >= 0.90, f1

    def test_reset_keeps_level_state(self, pair):
        from tiny_audio_tpu.vad import StreamingVad

        _, p = pair
        audio, _ = synth_utterance(2.0, seed=17)
        sv = StreamingVad(p)
        sv.feed(audio)
        n_before = sv._mean_n
        sv.reset(keep_level=True)
        assert sv._mean_n == n_before and sv._h is None
        assert sv.feed(audio).any()
        sv.reset(keep_level=False)
        assert sv._mean_n == 0
