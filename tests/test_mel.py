"""Mel front-end parity vs transformers.WhisperFeatureExtractor (the oracle).

Oracle-pattern test (SURVEY.md §4): the jitted TPU front-end must reproduce the
reference CPU feature extractor's numerics, since WER parity depends on
bit-comparable mel inputs to the frozen encoder.
"""

import numpy as np
import pytest

from tiny_audio_tpu.ops import mel


@pytest.fixture(scope="module")
def hf_fe_80():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor(feature_size=80)


@pytest.fixture(scope="module")
def hf_fe_128():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor(feature_size=128)


def _compare(fe, audio_list, num_mel_bins, pad_to=None):
    out = fe(
        audio_list,
        sampling_rate=16000,
        padding="max_length" if pad_to else "longest",
        max_length=pad_to,
        return_attention_mask=True,
        return_tensors="np",
    )
    ref = out["input_features"]
    lengths = np.array([len(a) for a in audio_list])
    max_len = pad_to or ref.shape[-1] * mel.HOP_LENGTH
    batch = np.zeros((len(audio_list), max_len), dtype=np.float32)
    for i, a in enumerate(audio_list):
        batch[i, : len(a)] = a
    ours = np.asarray(mel.log_mel_spectrogram(batch, num_mel_bins=num_mel_bins))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
    mask = np.asarray(mel.frame_attention_mask(lengths, ours.shape[-1]))
    np.testing.assert_array_equal(mask, out["attention_mask"])


def test_mel_80_fixed_30s(rng, hf_fe_80):
    audio = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    _compare(hf_fe_80, [audio], 80, pad_to=mel.N_SAMPLES)


def test_mel_128_variable_batch(rng, hf_fe_128):
    a = rng.standard_normal(16000).astype(np.float32) * 0.1
    b = rng.standard_normal(32000).astype(np.float32) * 0.05
    _compare(hf_fe_128, [a, b], 128)


def test_mel_nonmultiple_length(rng, hf_fe_128):
    # 12345 samples: HF pads to hop multiple internally via frame truncation
    a = rng.standard_normal(12345).astype(np.float32) * 0.2
    padded = mel.pad_to_multiple(a)
    assert padded.shape[-1] % mel.HOP_LENGTH == 0
    out = hf_fe_128(
        [padded],
        sampling_rate=16000,
        padding="longest",
        return_attention_mask=True,
        return_tensors="np",
    )
    ours = np.asarray(mel.log_mel_spectrogram(padded[None, :], num_mel_bins=128))
    np.testing.assert_allclose(ours, out["input_features"], atol=2e-4, rtol=1e-4)


def test_mel_tone_content():
    # A pure 440 Hz tone must put its energy in the right mel bin region
    t = np.arange(16000) / 16000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    feats = np.asarray(mel.log_mel_spectrogram(tone[None, :], num_mel_bins=80))[0]
    peak_bin = feats.mean(axis=1).argmax()
    fb = mel.mel_filter_bank(201, 80)
    freqs = np.linspace(0, 8000, 201)
    center = freqs[fb[:, peak_bin].argmax()]
    assert 300 < center < 600


def test_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel.mel_filter_bank(201, 128)
    ref = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, ref, atol=1e-10)
