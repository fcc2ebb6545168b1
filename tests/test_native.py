"""Native C++ audio runtime vs the numpy oracle implementations.

Oracle pattern from the reference test strategy (SURVEY.md §4): every native
kernel is pinned against the pure-numpy implementation it replaces.
"""

import io
import wave

import numpy as np
import pytest

from tiny_audio_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)

SR = 16000


def _wav_bytes(audio: np.ndarray, rate: int = SR, sampwidth: int = 2,
               channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 2:
            data = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        else:
            data = (np.clip(audio, -1, 1) * 2147483647).astype(np.int32)
        if channels > 1:
            data = np.repeat(data[:, None], channels, axis=1)
        w.writeframes(data.tobytes())
    return buf.getvalue()


class TestWavDecode:
    def test_matches_stdlib_pcm16(self):
        rng = np.random.default_rng(0)
        audio = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
        data = _wav_bytes(audio)
        out, rate = native.wav_decode(data)
        # oracle: stdlib wave module
        with wave.open(io.BytesIO(data), "rb") as w:
            raw = w.readframes(w.getnframes())
        oracle = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        assert rate == SR
        np.testing.assert_allclose(out, oracle, atol=1e-7)

    def test_stereo_averaged(self):
        audio = np.linspace(-0.5, 0.5, 100).astype(np.float32)
        out, rate = native.wav_decode(_wav_bytes(audio, channels=2))
        assert out.shape == (100,)
        np.testing.assert_allclose(out, audio, atol=1e-3)

    def test_pcm32(self):
        audio = np.linspace(-0.5, 0.5, 64).astype(np.float32)
        out, _ = native.wav_decode(_wav_bytes(audio, sampwidth=4))
        np.testing.assert_allclose(out, audio, atol=1e-6)

    def test_garbage_returns_none(self):
        assert native.wav_decode(b"not a wav at all") is None

    def test_read_wav_uses_native(self, tmp_path):
        from tiny_audio_tpu.utils.audio_io import read_wav

        audio = np.sin(np.linspace(0, 10, 500)).astype(np.float32) * 0.3
        p = tmp_path / "x.wav"
        p.write_bytes(_wav_bytes(audio))
        out, rate = read_wav(p)
        assert rate == SR and len(out) == 500


class TestResample:
    def test_sine_preserved(self):
        t = np.arange(SR) / SR
        sine = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = native.resample(sine, SR, 8000)
        assert abs(len(out) - 8000) <= 1
        t8 = np.arange(len(out)) / 8000
        expected = np.sin(2 * np.pi * 440 * t8).astype(np.float32)
        # ignore edges (filter warm-up)
        core = slice(100, -100)
        assert np.sqrt(np.mean((out[core] - expected[core]) ** 2)) < 0.02

    def test_identity(self):
        x = np.random.default_rng(0).standard_normal(100).astype(np.float32)
        np.testing.assert_array_equal(native.resample(x, SR, SR), x)

    def test_upsample_length(self):
        x = np.zeros(1000, np.float32)
        out = native.resample(x, 8000, SR)
        assert len(out) == 2000


class TestFFTConvolve:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal(1000).astype(np.float32)
        k = rng.standard_normal(64).astype(np.float32)
        out = native.fft_convolve(a, k)
        oracle = np.convolve(a.astype(np.float64), k.astype(np.float64))[: len(a)]
        np.testing.assert_allclose(out, oracle, atol=1e-3)

    def test_impulse_identity(self):
        a = np.random.default_rng(1).standard_normal(128).astype(np.float32)
        k = np.zeros(8, np.float32)
        k[0] = 1.0
        np.testing.assert_allclose(native.fft_convolve(a, k), a, atol=1e-4)


class TestMixSNR:
    def test_matches_numpy_oracle(self):
        from tiny_audio_tpu.train.augmentation import _mix_at_snr

        rng = np.random.default_rng(0)
        sig = (0.3 * np.sin(np.linspace(0, 60, 2000))).astype(np.float32)
        noise = rng.standard_normal(500).astype(np.float32)
        out = native.mix_at_snr(sig, noise, 12.0)
        oracle = _mix_at_snr(sig, noise, 12.0)
        np.testing.assert_allclose(out, oracle, atol=1e-4)


class TestVadFeatures:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        audio = rng.standard_normal(256 * 20).astype(np.float32) * 0.1
        energy, flat = native.vad_features(audio, 256)
        frames = audio.reshape(20, 256)
        oracle_e = 10.0 * np.log10(np.mean(frames**2, axis=1) + 1e-10)
        window = np.hanning(256)
        power = (np.abs(np.fft.rfft(frames * window, axis=1)) + 1e-10) ** 2
        oracle_f = np.exp(np.mean(np.log(power), axis=1)) / np.mean(power, axis=1)
        np.testing.assert_allclose(energy, oracle_e, atol=1e-3)
        np.testing.assert_allclose(flat, oracle_f, atol=1e-3)

    def test_vad_end_to_end_unchanged(self):
        """frame_vad decisions identical with and without the native path."""
        import os

        from tiny_audio_tpu.diarization import frame_vad

        t = np.arange(SR) / SR
        audio = np.concatenate([
            np.zeros(SR // 2, np.float32),
            (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
        ])
        with_native = frame_vad(audio)
        os.environ["TA_DISABLE_NATIVE"] = "1"
        native._lib = None
        native._tried = False
        try:
            without = frame_vad(audio)
        finally:
            del os.environ["TA_DISABLE_NATIVE"]
            native._tried = False
        assert (with_native == without).mean() > 0.99


def test_resample_length_agreement_rate_pairs():
    """Regression: C's float ceil produced out_len one above the wrapper's
    allocation at some rate pairs (147 @ 44100->24000), a heap overwrite."""
    from tiny_audio_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    for n, orig, target in [(147, 44100, 24000), (294, 44100, 24000),
                            (161, 22050, 16000), (1000, 8000, 16000)]:
        audio = np.sin(np.arange(n, dtype=np.float32) * 0.05)
        out = native.resample(audio, orig, target)
        assert out is not None
        assert len(out) == (n * target + orig - 1) // orig


def test_wav_decode_rejects_sub_byte_bits():
    """Regression: a 4-bit (IMA-ADPCM-style) fmt chunk caused integer
    division by zero in native code — SIGFPE, killing the process."""
    import struct

    from tiny_audio_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    fmt = struct.pack("<HHIIHH", 17, 1, 8000, 4000, 256, 4)  # bits=4
    data = b"\x00" * 64
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    assert native.wav_decode(wav) is None  # clean fallback, no crash
