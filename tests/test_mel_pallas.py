"""Fused Pallas mel kernel vs the XLA implementation (oracle pattern).

Runs in pallas interpret mode on the CPU test mesh; the XLA mel is itself
pinned against transformers.WhisperFeatureExtractor in test_mel.py, so
transitivity gives the HF contract.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tiny_audio_tpu.ops.mel import HOP_LENGTH, log_mel_spectrogram
from tiny_audio_tpu.ops.mel_pallas import TILE_T, log_mel_spectrogram_pallas


@pytest.mark.parametrize(
    "n_samples,mels",
    [
        (16000, 80),     # 1 s, whisper-base bins, single partial tile
        (48000, 128),    # 3 s, large-v3 bins
        (TILE_T * HOP_LENGTH, 128),   # exactly one tile
        (480000, 128),   # 30 s window, 12 tiles
    ],
)
def test_matches_xla_mel(n_samples, mels):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
    expected = np.asarray(log_mel_spectrogram(jnp.asarray(audio), num_mel_bins=mels))
    got = np.asarray(
        log_mel_spectrogram_pallas(
            jnp.asarray(audio), num_mel_bins=mels, interpret=True
        )
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_silence():
    audio = np.zeros((1, 32000), np.float32)
    out = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(audio), num_mel_bins=80,
                                   interpret=True)
    )
    expected = np.asarray(
        log_mel_spectrogram(jnp.asarray(audio), num_mel_bins=80)
    )
    np.testing.assert_allclose(out, expected, atol=5e-4)
