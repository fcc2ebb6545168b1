"""Train the neural VAD (tiny_audio_tpu/vad.py) on synthesized speech.

The TEN-VAD analogue (reference diarization.py:361-454) trained offline:
formant-synthesized utterances (utils/speech_synth.py) are mixed through an
augmentation grid — white/pink/babble/music/hum noise at -5..30 dB SNR,
synthetic-RIR reverb (near- and far-field), level roving, clipping,
speaker overlap, and noise-only negatives — and a causal conv+GRU frame
classifier is fit with masked BCE (±2 frames around speech boundaries are
don't-care: reverb smears edges and the downstream segmenter re-pads them
anyway).

Run from the repo root (1–2 min of data synth + ~5–10 min of training):

    python - < scripts/train_vad.py            # writes vad_weights.msgpack

Ends by printing a heuristic-vs-neural F1 table over held-out conditions
(the numbers recorded in docs/evaluation-and-deployment.md).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

SR = 16000
CLIP_S = 4.0
N_FRAMES = int(CLIP_S * SR) // 256  # 250
N_SAMPLES = N_FRAMES * 256

N_UTTS = 600
N_STEPS = 1500
BATCH = 32
LR = 2e-3
SEED = 0


# ----------------------------------------------------------------- noise bank


def pink_noise(n: int, rng) -> np.ndarray:
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / SR), 1.0)
    out = np.fft.irfft(spec / np.sqrt(freqs), n)
    return (out / (np.std(out) + 1e-9)).astype(np.float32)


def music_noise(n: int, rng) -> np.ndarray:
    """Chord of harmonics with onsets — tonal interference (low spectral
    flatness: the heuristic's blind spot)."""
    t = np.arange(n) / SR
    root = rng.uniform(80, 400)
    out = np.zeros(n, np.float32)
    for mult in rng.choice([1.0, 1.25, 1.5, 2.0, 2.5, 3.0], 4, replace=False):
        phase = rng.uniform(0, 2 * np.pi)
        vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
        out += rng.uniform(0.3, 1.0) * np.sin(
            2 * np.pi * root * mult * vib * t + phase
        ).astype(np.float32)
    # note onsets every 0.3-0.8 s
    env = np.ones(n, np.float32)
    pos = 0
    while pos < n:
        dur = int(rng.uniform(0.3, 0.8) * SR)
        seg = min(dur, n - pos)
        env[pos: pos + seg] = np.exp(-2.0 * np.linspace(0, 1, seg))
        pos += dur
    out *= env
    return (out / (np.std(out) + 1e-9)).astype(np.float32)


def hum_noise(n: int, rng) -> np.ndarray:
    t = np.arange(n) / SR
    base = rng.choice([50.0, 60.0])
    out = sum(
        rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * base * k * t)
        for k in (1, 2, 3)
    )
    out = out + 0.1 * rng.standard_normal(n)
    return (out / (np.std(out) + 1e-9)).astype(np.float32)


def synth_rir(rng, rt60: float, drr_db: float) -> np.ndarray:
    """Exponentially decaying noise RIR; ``drr_db`` sets the direct-path
    level over the reverb tail (low = far-field)."""
    n = int(rt60 * SR)
    t = np.arange(n) / SR
    tail = rng.standard_normal(n).astype(np.float32) * np.exp(
        -6.9 * t / rt60
    )
    tail[: int(0.003 * SR)] *= 0.1  # pre-delay
    tail /= np.sqrt(np.sum(tail**2)) + 1e-9
    rir = tail * 10 ** (-drr_db / 20)
    rir[0] += 1.0  # direct path
    return rir


def apply_rir(x: np.ndarray, rir: np.ndarray) -> np.ndarray:
    n = len(x)
    nfft = 1 << int(np.ceil(np.log2(n + len(rir))))
    y = np.fft.irfft(np.fft.rfft(x, nfft) * np.fft.rfft(rir, nfft), nfft)[:n]
    return y.astype(np.float32)


# ------------------------------------------------------------------- examples


class ExampleFactory:
    def __init__(self, rng):
        from tiny_audio_tpu.utils.speech_synth import synth_utterance

        self.rng = rng
        print(f"[data] synthesizing {N_UTTS} dry utterances...", flush=True)
        t0 = time.time()
        self.utts = []
        for i in range(N_UTTS):
            f0 = rng.uniform(90, 260)
            scale = rng.uniform(0.95, 1.25)
            audio, mask = synth_utterance(
                CLIP_S, SR, seed=i, f0=f0, vocal_tract_scale=scale,
                speech_fraction=rng.uniform(0.35, 0.85),
            )
            self.utts.append((audio[:N_SAMPLES], mask[:N_SAMPLES]))
        # babble = sums of utterances (generated from the same pool but only
        # mixed as noise, never labeled speech)
        print(f"[data] done in {time.time() - t0:.1f}s", flush=True)

    def babble(self, n: int) -> np.ndarray:
        rng = self.rng
        out = np.zeros(n, np.float32)
        for _ in range(6):
            a, _ = self.utts[rng.integers(len(self.utts))]
            out += np.roll(a, rng.integers(n))[:n]
        return (out / (np.std(out) + 1e-9)).astype(np.float32)

    def noise(self, n: int) -> np.ndarray:
        rng = self.rng
        kind = rng.integers(5)
        if kind == 0:
            return rng.standard_normal(n).astype(np.float32)
        if kind == 1:
            return pink_noise(n, rng)
        if kind == 2:
            return self.babble(n)
        if kind == 3:
            return music_noise(n, rng)
        return hum_noise(n, rng)

    def example(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (audio [N_SAMPLES], labels [N_FRAMES], weight [N_FRAMES])."""
        from tiny_audio_tpu.utils.speech_synth import mask_to_frames

        rng = self.rng
        roll = rng.random()
        if roll < 0.15:  # noise-only negative
            audio = np.zeros(N_SAMPLES, np.float32)
            mask = np.zeros(N_SAMPLES, bool)
        else:
            a, m = self.utts[rng.integers(len(self.utts))]
            audio, mask = a.copy(), m.copy()
            if roll < 0.30:  # overlapping second speaker
                b, mb = self.utts[rng.integers(len(self.utts))]
                shift = rng.integers(N_SAMPLES)
                audio = audio + 0.8 * np.roll(b, shift)
                mask = mask | np.roll(mb, shift)

        # reverb BEFORE noise (the room acts on the source); labels stay dry
        if rng.random() < 0.4 and mask.any():
            rir = synth_rir(
                rng, rt60=rng.uniform(0.15, 1.0),
                drr_db=rng.uniform(-6.0, 12.0),  # low DRR = far-field
            )
            audio = apply_rir(audio, rir)

        speech_rms = (
            np.sqrt(np.mean(audio[mask] ** 2)) if mask.any() else 0.0
        )
        noise = self.noise(N_SAMPLES)
        if speech_rms > 0:
            snr_db = rng.uniform(-5.0, 30.0)
            noise_rms = speech_rms / (10 ** (snr_db / 20))
        else:
            noise_rms = rng.uniform(0.003, 0.1)
        audio = audio + noise * noise_rms

        # level roving + occasional clipping
        peak = np.max(np.abs(audio)) + 1e-9
        audio = audio * (10 ** (rng.uniform(-45.0, -6.0) / 20) / peak)
        if rng.random() < 0.1:
            audio = np.clip(audio * rng.uniform(2.0, 5.0), -1.0, 1.0)

        labels = mask_to_frames(mask, 256).astype(np.float32)[:N_FRAMES]
        # boundary don't-care: ±2 frames around every speech edge
        edges = np.flatnonzero(np.diff(labels) != 0)
        weight = np.ones(N_FRAMES, np.float32)
        for e in edges:
            weight[max(e - 1, 0): e + 3] = 0.0
        return audio.astype(np.float32), labels, weight

    def batch(self, size: int):
        xs, ys, ws = zip(*(self.example() for _ in range(size)))
        return np.stack(xs), np.stack(ys), np.stack(ws)


# ------------------------------------------------------------------- training


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache
    from tiny_audio_tpu.vad import N_MELS, build_vadnet, vad_logmel

    enable_persistent_compile_cache()
    rng = np.random.default_rng(SEED)
    factory = ExampleFactory(rng)

    net = build_vadnet()
    params = net.init(
        jax.random.PRNGKey(SEED), jnp.zeros((1, 8, N_MELS), jnp.float32)
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[train] VADNet params: {n_params:,}")

    tx = optax.adamw(
        optax.cosine_decay_schedule(LR, N_STEPS, alpha=0.02),
        weight_decay=1e-5,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, audio, labels, weight):
        feats = vad_logmel(audio, n_frames=N_FRAMES)

        def loss_fn(p):
            logits = net.apply({"params": p}, feats)
            per = optax.sigmoid_binary_cross_entropy(logits, labels)
            return jnp.sum(per * weight) / jnp.maximum(jnp.sum(weight), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for i in range(1, N_STEPS + 1):
        audio, labels, weight = factory.batch(BATCH)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(audio), jnp.asarray(labels),
            jnp.asarray(weight),
        )
        if i % 100 == 0 or i == 1:
            print(
                f"[train] step {i}/{N_STEPS} loss={float(loss):.4f} "
                f"({time.time() - t0:.0f}s)", flush=True,
            )

    out_path = Path("tiny_audio_tpu/data/vad_weights.msgpack")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(
        serialization.to_bytes(jax.device_get(params))
    )
    print(f"[train] wrote {out_path} ({out_path.stat().st_size / 1024:.0f} KB)")

    evaluate(params)


# ----------------------------------------------------------------- evaluation


def _f1(pred: np.ndarray, truth: np.ndarray) -> float:
    tp = float(np.sum(pred & truth))
    p = tp / max(float(np.sum(pred)), 1.0)
    r = tp / max(float(np.sum(truth)), 1.0)
    return 2 * p * r / max(p + r, 1e-9)


def evaluate(params=None) -> dict:
    """Heuristic-vs-neural F1 over held-out conditions (fresh seeds)."""
    from tiny_audio_tpu.diarization import frame_vad
    from tiny_audio_tpu.utils.speech_synth import mask_to_frames, synth_utterance
    from tiny_audio_tpu.vad import HOP, NeuralVAD

    if params is not None:
        neural = NeuralVAD(params)
    else:
        neural = NeuralVAD.get()
        assert neural is not None, "no trained weights found"

    rng = np.random.default_rng(12345)
    dur = 8.0
    conditions = {}

    def add(name, audio, mask):
        truth = mask_to_frames(mask, HOP)
        n = len(truth)
        conditions[name] = (
            _f1(frame_vad(audio)[:n], truth), _f1(neural(audio)[:n], truth)
        )

    for seed in (1001, 1002):
        audio, mask = synth_utterance(dur, seed=seed, f0=rng.uniform(100, 230))
        peak = np.max(np.abs(audio))

        add(f"clean#{seed % 10}", audio, mask)
        add(f"quiet -40dBFS#{seed % 10}",
            audio * (10 ** (-40 / 20) / peak), mask)
        sp_rms = np.sqrt(np.mean(audio[mask] ** 2))
        for snr in (0, 10):
            noise = rng.standard_normal(len(audio)).astype(np.float32)
            noise *= sp_rms / (10 ** (snr / 20))
            add(f"white {snr}dB#{seed % 10}", audio + noise, mask)
        music = music_noise(len(audio), rng) * sp_rms / (10 ** (10 / 20))
        add(f"music 10dB#{seed % 10}", audio + music, mask)
        # far-field: strong reverb, weak direct path, moderate noise
        rir = synth_rir(rng, rt60=0.8, drr_db=-4.0)
        far = apply_rir(audio, rir)
        far += rng.standard_normal(len(far)).astype(np.float32) * (
            np.sqrt(np.mean(far**2)) / (10 ** (15 / 20))
        )
        add(f"far-field#{seed % 10}", far, mask)
        # overlap: second speaker at half amplitude
        b, mb = synth_utterance(dur, seed=seed + 50, f0=210.0,
                                vocal_tract_scale=1.15)
        add(f"overlap#{seed % 10}", audio + 0.6 * b, mask | mb)

    print(f"\n{'condition':<22}{'heuristic':>10}{'neural':>10}")
    for name, (h, n) in sorted(conditions.items()):
        print(f"{name:<22}{h:>10.3f}{n:>10.3f}")
    hs = np.mean([h for h, _ in conditions.values()])
    ns = np.mean([n for _, n in conditions.values()])
    print(f"{'MEAN':<22}{hs:>10.3f}{ns:>10.3f}")
    return conditions


if __name__ == "__main__":
    main()
