"""Trained neural VAD — the TEN-VAD analogue of this framework.

The reference gates diarization with the trained TEN-VAD C library
(``/root/reference/tiny_audio/diarization.py:361-454``, hop 256 @ 16 kHz).
Round 1/2 substituted an energy + spectral-flatness heuristic
(:func:`tiny_audio_tpu.diarization.frame_vad`); its failure modes are
exactly where a trained model wins — low SNR (0 dB white noise: speech adds
~3 dB over the floor), tonal/music interference (low flatness looks
"voiced"), and far-field reverb (smeared energy contrasts).

This module is a small causal conv + GRU frame classifier over 40-band
log-mel features on the same hop-256 grid, trained offline on
formant-synthesized speech (:mod:`tiny_audio_tpu.utils.speech_synth`)
mixed through a noise/reverb/level augmentation grid
(``scripts/train_vad.py``), with weights checked into the repo
(``tiny_audio_tpu/data/vad_weights.msgpack``, ~190 KB).  Inference is one
jitted forward over length buckets; the network is causal (convs are
left-padded, the GRU runs forward only) so it can stream.

:func:`frame_vad_auto` is the diarizer's entry: neural when weights are
present, heuristic fallback otherwise (callers can tell which ran).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Optional

import numpy as np

SAMPLE_RATE = 16000
HOP = 256          # TEN-VAD frame grid (reference diarization.py:378)
WIN = 512          # analysis window (2 hops, hann)
N_MELS = 40
WEIGHTS_PATH = Path(__file__).parent / "data" / "vad_weights.msgpack"

# Inference length buckets (frames) — few enough that every jitted shape
# compiles once; 16 kHz / hop 256 = 62.5 frames/s, so 4096 frames ≈ 65 s.
_FRAME_BUCKETS = (256, 1024, 4096)

#: decision threshold on sigmoid(logit); chosen on the validation grid in
#: scripts/train_vad.py (balanced F1 across SNR/reverb conditions)
THRESHOLD = 0.5


# ------------------------------------------------------------------- features


def _mel_filterbank(n_mels: int = N_MELS, n_fft: int = WIN,
                    sr: int = SAMPLE_RATE) -> np.ndarray:
    """Triangular mel filterbank [n_fft//2+1, n_mels] (HTK mel scale,
    0..Nyquist)."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2))
    fb = np.zeros((n_fft // 2 + 1, n_mels), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[:, i] = np.maximum(0.0, np.minimum(up, down))
    return fb


_FILTERBANK: Optional[np.ndarray] = None
_HANN: Optional[np.ndarray] = None


def vad_logmel(audio, n_frames: Optional[int] = None):
    """[..., n] float32 -> [..., T, N_MELS] log-mel on the hop-256 grid.

    Frame t covers samples ``[t*HOP, t*HOP + WIN)`` (past-aligned half-
    overlap) so frame t needs only one hop of lookahead — near-causal,
    matching TEN-VAD's streaming contract.  Per-clip log-domain mean
    subtraction gives level invariance.  jnp, jit-safe for fixed n_frames.
    """
    import jax.numpy as jnp

    global _FILTERBANK, _HANN
    if _FILTERBANK is None:
        _FILTERBANK = _mel_filterbank()
        _HANN = np.hanning(WIN).astype(np.float32)

    audio = jnp.asarray(audio, jnp.float32)
    if n_frames is None:
        n_frames = int(audio.shape[-1]) // HOP
    pad = n_frames * HOP + (WIN - HOP) - audio.shape[-1]
    if pad > 0:
        widths = [(0, 0)] * (audio.ndim - 1) + [(0, int(pad))]
        audio = jnp.pad(audio, widths)
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(WIN)[None, :]
    frames = audio[..., idx] * jnp.asarray(_HANN)
    power = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    logmel = jnp.log(power @ jnp.asarray(_FILTERBANK) + 1e-8)
    return logmel - jnp.mean(logmel, axis=-2, keepdims=True)


# -------------------------------------------------------------------- network


def build_vadnet():
    """Construct the flax module (lazy: importing this file must not pull
    flax until a VAD actually runs)."""
    import flax.linen as nn

    class VADNet(nn.Module):
        """Causal dilated-conv stack + forward GRU + per-frame logit.

        ~47k params.  Convs are left-padded (no future context beyond the
        feature window); dilations widen the receptive field to ~28 frames
        (~450 ms) before the GRU integrates arbitrary left context.
        """

        hidden: int = 48
        gru_hidden: int = 64

        @nn.compact
        def __call__(self, x):  # [B, T, N_MELS] -> [B, T] logits
            for dilation in (1, 2, 4):
                x = nn.Conv(
                    self.hidden, kernel_size=(5,),
                    kernel_dilation=(dilation,),
                    padding=[(4 * dilation, 0)],  # causal left pad
                    name=f"conv_d{dilation}",
                )(x)
                x = nn.relu(x)
            x = nn.RNN(nn.GRUCell(features=self.gru_hidden), name="gru")(x)
            return nn.Dense(1, name="out")(x)[..., 0]

    return VADNet()


# ------------------------------------------------------------------ inference


class NeuralVAD:
    """Loads the checked-in weights once per process; jitted bucketed
    forward.  ``NeuralVAD.get()`` returns None when no weights exist (the
    diarizer then falls back to the heuristic)."""

    _instance: Optional["NeuralVAD"] = None
    _lock = threading.Lock()
    _load_failed = False

    def __init__(self, params: dict):
        import jax

        self.params = params
        self.net = build_vadnet()

        def forward(p, feats):
            return self.net.apply({"params": p}, feats)

        self._forward = jax.jit(forward)

    # ----------------------------------------------------------- construction

    @classmethod
    def get(cls) -> Optional["NeuralVAD"]:
        with cls._lock:
            if cls._instance is not None:
                return cls._instance
            if cls._load_failed or not WEIGHTS_PATH.is_file():
                return None
            try:
                cls._instance = cls.from_file(WEIGHTS_PATH)
            except Exception:  # corrupt/incompatible weights -> heuristic
                cls._load_failed = True
                return None
            return cls._instance

    @classmethod
    def from_file(cls, path: str | Path) -> "NeuralVAD":
        import jax.numpy as jnp
        from flax import serialization

        net = build_vadnet()
        template = net.init(
            __import__("jax").random.PRNGKey(0),
            jnp.zeros((1, 8, N_MELS), jnp.float32),
        )["params"]
        params = serialization.from_bytes(
            template, Path(path).read_bytes()
        )
        return cls(params)

    # -------------------------------------------------------------- prediction

    def frame_probs(self, audio: np.ndarray) -> np.ndarray:
        """[n] float32 samples -> [n//HOP] speech probabilities."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        n_frames = len(audio) // HOP
        if n_frames == 0:
            return np.zeros(0, np.float32)
        bucket = next(
            (b for b in _FRAME_BUCKETS if b >= n_frames), None
        )
        if bucket is None:
            # long clips: tile the largest bucket with 32 frames of left
            # overlap so conv/GRU context warms up before scored frames
            # (step + ctx == largest bucket, so recursion always terminates)
            probs = np.zeros(n_frames, np.float32)
            ctx = 32
            step = _FRAME_BUCKETS[-1] - ctx
            start = 0
            while start < n_frames:
                s0 = max(start - ctx, 0)
                end = min(start + step, n_frames)
                chunk = audio[s0 * HOP: end * HOP]
                p = self.frame_probs(chunk)
                probs[start:end] = p[start - s0: end - s0]
                start = end
            return probs
        # Features over the REAL frames only, THEN pad to the bucket: the
        # per-clip mean normalization inside vad_logmel must not see bucket
        # padding (zeros drag the log-mel mean down and shift every real
        # frame's features — a train/inference mismatch that measurably
        # hurt F1), and the network is causal (left-padded convs + forward
        # GRU), so trailing pad frames cannot affect real frames' logits.
        feats = np.asarray(vad_logmel(audio[None, :], n_frames=n_frames))
        if bucket > n_frames:
            feats = np.pad(feats, ((0, 0), (0, bucket - n_frames), (0, 0)))
        logits = np.asarray(self._forward(self.params, feats))[0]
        return 1.0 / (1.0 + np.exp(-logits[:n_frames]))

    def __call__(self, audio: np.ndarray,
                 threshold: float = THRESHOLD) -> np.ndarray:
        """[n] samples -> [n//HOP] bool speech decisions."""
        return self.frame_probs(audio) >= threshold


def frame_vad_auto(
    audio: np.ndarray, sample_rate: int = SAMPLE_RATE
) -> tuple[np.ndarray, bool]:
    """Per-frame speech decisions via the trained VAD when weights are
    available, else the energy/flatness heuristic.

    Returns ``(decisions, trained)`` — ``trained=False`` means the
    heuristic ran (diarizer tags results ``"vad_fallback"``).
    """
    if sample_rate != SAMPLE_RATE:
        from tiny_audio_tpu.utils.audio_io import resample

        audio = resample(
            np.asarray(audio, np.float32), sample_rate, SAMPLE_RATE
        )
    model = NeuralVAD.get()
    if model is not None:
        return model(audio), True
    from tiny_audio_tpu.diarization import frame_vad

    return frame_vad(audio, SAMPLE_RATE), False
