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


def _dsp_tables() -> tuple[np.ndarray, np.ndarray]:
    global _FILTERBANK, _HANN
    if _FILTERBANK is None:
        _FILTERBANK = _mel_filterbank()
        _HANN = np.hanning(WIN).astype(np.float32)
    return _FILTERBANK, _HANN


def _raw_logmel_np(frames: np.ndarray) -> np.ndarray:
    """[T, WIN] windowed-ready sample frames -> [T, N_MELS] UN-normalized
    log-mel, pure numpy (host DSP; no XLA dispatch)."""
    fb, hann = _dsp_tables()
    power = np.abs(np.fft.rfft(frames * hann, axis=-1)) ** 2
    return np.log(power @ fb + 1e-8).astype(np.float32)


def _frame_signal(audio: np.ndarray, n_frames: int) -> np.ndarray:
    """[n] samples -> [n_frames, WIN] hop-strided frames (zero-padded
    tail), matching :func:`vad_logmel`'s framing."""
    need = n_frames * HOP + (WIN - HOP)
    if audio.shape[-1] < need:
        audio = np.pad(audio, (0, need - audio.shape[-1]))
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(WIN)[None, :]
    return audio[idx]


def vad_logmel_np(audio: np.ndarray, n_frames: Optional[int] = None
                  ) -> np.ndarray:
    """Numpy mirror of :func:`vad_logmel` for a single clip:
    [n] float32 -> [T, N_MELS], per-clip mean-subtracted.

    Inference uses this instead of the jnp version: clip lengths are
    unique per call, and eager jnp ops on the tunneled TPU backend
    compile a fresh tiny kernel per shape (a recompile storm in the
    realtime server — ~200 s endpoint latency before this existed)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    if n_frames is None:
        n_frames = audio.size // HOP
    logmel = _raw_logmel_np(_frame_signal(audio, n_frames))
    return logmel - logmel.mean(axis=0, keepdims=True)


def vad_logmel(audio, n_frames: Optional[int] = None):
    """[..., n] float32 -> [..., T, N_MELS] log-mel on the hop-256 grid.

    Frame t covers samples ``[t*HOP, t*HOP + WIN)`` (past-aligned half-
    overlap) so frame t needs only one hop of lookahead — near-causal,
    matching TEN-VAD's streaming contract.  Per-clip log-domain mean
    subtraction gives level invariance.  jnp, jit-safe for fixed n_frames.
    """
    import jax.numpy as jnp

    _dsp_tables()
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
        template = __import__("jax").eval_shape(
            net.init,
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
        # Host numpy DSP: clip lengths are unique, so the jnp version
        # would compile a fresh eager kernel per clip on TPU.
        feats = vad_logmel_np(audio, n_frames=n_frames)[None]
        if bucket > n_frames:
            feats = np.pad(feats, ((0, 0), (0, bucket - n_frames), (0, 0)))
        logits = np.asarray(self._forward(self.params, feats))[0]
        return 1.0 / (1.0 + np.exp(-logits[:n_frames]))

    def __call__(self, audio: np.ndarray,
                 threshold: float = THRESHOLD) -> np.ndarray:
        """[n] samples -> [n//HOP] bool speech decisions."""
        return self.frame_probs(audio) >= threshold


# ------------------------------------------------------------------ streaming


def _np_params(params: dict) -> dict:
    """Flatten the flax param tree to host numpy arrays."""
    out = {}
    for name in ("conv_d1", "conv_d2", "conv_d4"):
        out[name] = (np.asarray(params[name]["kernel"], np.float32),
                     np.asarray(params[name]["bias"], np.float32))
    gru = params["GRUCell_0"]
    for g in ("ir", "iz", "in", "hr", "hz", "hn"):
        out[g] = (np.asarray(gru[g]["kernel"], np.float32),
                  np.asarray(gru[g].get("bias"), np.float32)
                  if "bias" in gru[g] else None)
    out["out"] = (np.asarray(params["out"]["kernel"], np.float32),
                  np.asarray(params["out"]["bias"], np.float32))
    return out


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60.0, 60.0)))


def np_conv_stack(p: dict, x: np.ndarray) -> np.ndarray:
    """[T, N_MELS] normalized features -> [T, hidden] conv-stack output
    (causal zero left-padding, identical to the flax convs)."""
    for name, d in (("conv_d1", 1), ("conv_d2", 2), ("conv_d4", 4)):
        k, b = p[name]  # [5, Cin, Cout]
        taps = k.shape[0]
        pad = (taps - 1) * d
        xp = np.concatenate(
            [np.zeros((pad, x.shape[1]), np.float32), x], axis=0
        )
        T = x.shape[0]
        y = b + sum(xp[j * d: j * d + T] @ k[j] for j in range(taps))
        x = np.maximum(y, 0.0)
    return x


def np_gru_head(p: dict, x: np.ndarray,
                h0: Optional[np.ndarray] = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """[T, hidden] conv outputs -> ([T] logits, final GRU hidden);
    flax GRUCell semantics exactly."""
    h = np.zeros(p["hr"][0].shape[0], np.float32) if h0 is None else h0
    w_out, b_out = p["out"]
    logits = np.empty(x.shape[0], np.float32)
    for t in range(x.shape[0]):
        xt = x[t]
        r = _sigmoid(xt @ p["ir"][0] + p["ir"][1] + h @ p["hr"][0])
        z = _sigmoid(xt @ p["iz"][0] + p["iz"][1] + h @ p["hz"][0])
        n = np.tanh(xt @ p["in"][0] + p["in"][1]
                    + r * (h @ p["hn"][0] + p["hn"][1]))
        h = (1.0 - z) * n + z * h
        logits[t] = float(h @ w_out[:, 0] + b_out[0])
    return logits, h


def np_vadnet_forward(p: dict, x: np.ndarray) -> np.ndarray:
    """Numpy mirror of the full VADNet batch forward: [T, N_MELS]
    normalized features -> [T] logits.  Exactly matches the flax forward
    (tested to 1e-4 in tests/test_vad_validation.py)."""
    return np_gru_head(p, np_conv_stack(p, x))[0]


class StreamingVad:
    """Host-side incremental VAD: O(new frames) per call, zero XLA
    dispatch — the TEN-VAD streaming analogue (the reference's VAD is a
    per-frame C library on the host, diarization.py:361-454; ours is the
    same trained net as :class:`NeuralVAD` run incrementally in numpy).

    Differences vs the batch scorer, both validated in
    ``tests/test_vad_validation.py``:

    - normalization uses a per-frame CUMULATIVE log-mel mean over the
      session so far (converges to the per-clip mean the net was trained
      with, and makes decisions exactly chunk-size-invariant);
    - the GRU integrates from session start instead of from the scored
      buffer's start (strictly more left context; the net is causal).

    State per instance: pending unframed samples, the last ``CTX`` raw
    (un-normalized) feature rows for conv left-context, the GRU hidden,
    and the running mean.  ``reset()`` clears turn-local state but keeps
    the running level estimate.
    """

    #: conv-stack receptive field in frames: 4*(1+2+4) left taps
    CTX = 28

    def __init__(self, params: dict):
        self.p = params if "ir" in params else _np_params(params)
        self._mean_sum = np.zeros(N_MELS, np.float64)
        self._mean_n = 0
        self.reset(keep_level=True)

    @classmethod
    def make(cls) -> Optional["StreamingVad"]:
        """Fresh per-session instance over the checked-in weights (numpy
        weight dict shared process-wide), or None without weights."""
        model = NeuralVAD.get()
        if model is None:
            return None
        global _NP_PARAMS
        if _NP_PARAMS is None:
            _NP_PARAMS = _np_params(model.params)
        return cls(_NP_PARAMS)

    def reset(self, keep_level: bool = True) -> None:
        self._pending = np.zeros(0, np.float32)
        self._ctx = np.zeros((0, N_MELS), np.float32)  # normalized rows, <= CTX
        self._h: Optional[np.ndarray] = None
        if not keep_level:
            self._mean_sum[:] = 0.0
            self._mean_n = 0

    def feed(self, samples: np.ndarray,
             threshold: float = THRESHOLD) -> np.ndarray:
        """Append samples; return bool decisions for newly completed
        frames (a frame completes once its full WIN window arrived)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            self._pending = (np.concatenate([self._pending, samples])
                             if self._pending.size else samples)
        if self._pending.size < WIN:
            return np.zeros(0, bool)
        k = (self._pending.size - WIN) // HOP + 1
        frames = np.lib.stride_tricks.sliding_window_view(
            self._pending, WIN
        )[::HOP][:k]
        raw = _raw_logmel_np(frames)
        self._pending = self._pending[k * HOP:]

        # Per-row CUMULATIVE mean: frame i is normalized by the mean of
        # rows 0..i, a pure function of the frame index — decisions are
        # therefore exactly chunk-size-invariant, and normalized rows can
        # be cached as conv context verbatim.  (Converges to the per-clip
        # mean the net was trained with; the first ~0.5 s of a session is
        # normalized by a small-sample mean, which the lead-in silence of
        # real sessions absorbs.)
        csum = np.cumsum(raw, axis=0, dtype=np.float64) + self._mean_sum
        counts = (np.arange(1, k + 1, dtype=np.float64)
                  + self._mean_n)[:, None]
        x_new = raw - (csum / counts).astype(np.float32)
        self._mean_sum = csum[-1]
        self._mean_n += k

        # When fewer than CTX context rows exist they are ALL rows since
        # session start, so the conv stack's internal zero left-padding
        # reproduces the batch forward exactly; once trimmed to CTX rows
        # the new frames' receptive fields are fully covered.
        x = np.concatenate([self._ctx, x_new], axis=0)
        conv_out = np_conv_stack(self.p, x)[-k:]
        logits, self._h = np_gru_head(self.p, conv_out, h0=self._h)

        self._ctx = x[-self.CTX:]
        thr_logit = float(np.log(threshold / (1.0 - threshold)))
        return logits >= thr_logit


_NP_PARAMS: Optional[dict] = None


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
