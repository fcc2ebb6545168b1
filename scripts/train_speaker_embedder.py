"""Train a compact ECAPA-TDNN speaker embedder on synthetic voices.

The diarizer's embedding stage wraps the speechbrain-exact
:class:`~tiny_audio_tpu.models.ecapa.EcapaTDNN`; real ``spkrec-ecapa-voxceleb``
weights need network access (PARITY.md).  Offline, clustering random-init
embeddings measured 48.6% DER on the synthetic-conversation benchmark
(scripts/bench_quality.py).  This script trains a small-channel variant
(256-wide, ~1.7M params) with AAM-softmax over a population of synthetic
speakers — distinct (f0, vocal-tract scale, bandwidth profile) voices from
the formant synthesizer — through the same noise/reverb/level augmentation
grid as the VAD.  The result is NOT a voxceleb-grade speaker model (it has
only seen formant speech); it is the offline tier that makes the shipped
diarizer actually separate voices, and it is tagged ``tier="synthetic"``
so downstream results say which embedder ran.

Run from the repo root:

    python - < scripts/train_speaker_embedder.py

Writes ``tiny_audio_tpu/data/ecapa_synthetic.msgpack`` (~7 MB) and prints
before/after DER on the synthetic-conversation benchmark.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

SR = 16000
WINDOW_S = 0.75          # diarizer embedding window (diarization.py)
WIN_SAMPLES = int(WINDOW_S * SR)
N_SPEAKERS = 192
UTTS_PER_SPEAKER = 4
UTT_S = 3.0
N_STEPS = 3500
BATCH = 64
LR = 1e-3
SEED = 0
MARGIN = 0.2             # AAM-softmax margin
SCALE = 30.0             # AAM-softmax scale

# Small-channel ECAPA: same architecture family as the speechbrain model,
# sized to be checked into git (see docstring).
CHANNELS = (256, 256, 256, 256, 768)
OUT_PATH = Path("tiny_audio_tpu/data/ecapa_synthetic.msgpack")


def _speaker_voice(rng) -> dict:
    return {
        "f0": float(np.exp(rng.uniform(np.log(85.0), np.log(280.0)))),
        "scale": float(rng.uniform(0.88, 1.32)),
    }


class SpeakerData:
    def __init__(self, rng):
        from tiny_audio_tpu.utils.speech_synth import synth_utterance

        self.rng = rng
        print(f"[data] synthesizing {N_SPEAKERS} voices x "
              f"{UTTS_PER_SPEAKER} utts...", flush=True)
        t0 = time.time()
        self.voices = [_speaker_voice(rng) for _ in range(N_SPEAKERS)]
        self.utts: list[list[np.ndarray]] = []
        for spk, v in enumerate(self.voices):
            clips = []
            for u in range(UTTS_PER_SPEAKER):
                audio, mask = synth_utterance(
                    UTT_S, SR, seed=spk * 101 + u,
                    f0=v["f0"] * float(rng.uniform(0.96, 1.04)),
                    vocal_tract_scale=v["scale"],
                    speech_fraction=0.85,
                )
                # keep only speech samples (windows must contain voice)
                clips.append(audio)
            self.utts.append(clips)
        print(f"[data] done in {time.time() - t0:.1f}s", flush=True)

    def _augment(self, w: np.ndarray) -> np.ndarray:
        import importlib.util

        rng = self.rng
        # reuse the VAD trainer's augmentation primitives
        if not hasattr(self, "_vadmod"):
            # robust under `python - < scripts/...` where __file__ is stdin
            cand = Path(__file__).resolve().parent / "train_vad.py"
            if not cand.is_file():
                cand = Path("scripts/train_vad.py").resolve()
            spec = importlib.util.spec_from_file_location("train_vad", cand)
            self._vadmod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(self._vadmod)
        m = self._vadmod
        if rng.random() < 0.45:
            rir = m.synth_rir(rng, rt60=float(rng.uniform(0.15, 0.9)),
                              drr_db=float(rng.uniform(-6.0, 12.0)))
            w = m.apply_rir(w, rir)
        if rng.random() < 0.7:
            kind = rng.integers(3)
            n = len(w)
            noise = (rng.standard_normal(n).astype(np.float32) if kind == 0
                     else m.pink_noise(n, rng) if kind == 1
                     else m.hum_noise(n, rng))
            rms = float(np.sqrt(np.mean(w**2))) + 1e-9
            snr = float(rng.uniform(0.0, 25.0))
            w = w + noise * rms / (10 ** (snr / 20))
        peak = float(np.max(np.abs(w))) + 1e-9
        return (w * 10 ** (float(self.rng.uniform(-30.0, -6.0)) / 20) / peak
                ).astype(np.float32)

    def batch(self, size: int):
        rng = self.rng
        xs, ys = [], []
        for _ in range(size):
            spk = int(rng.integers(N_SPEAKERS))
            clip = self.utts[spk][int(rng.integers(UTTS_PER_SPEAKER))]
            start = int(rng.integers(0, len(clip) - WIN_SAMPLES))
            w = clip[start: start + WIN_SAMPLES].copy()
            xs.append(self._augment(w))
            ys.append(spk)
        return np.stack(xs), np.asarray(ys, np.int32)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from tiny_audio_tpu.diarization import _speaker_fbank
    from tiny_audio_tpu.models.ecapa import EcapaTDNN
    from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    rng = np.random.default_rng(SEED)
    data = SpeakerData(rng)

    net = EcapaTDNN(channels=CHANNELS)
    feats0 = _speaker_fbank(np.zeros((1, WIN_SAMPLES), np.float32))
    params = net.init(jax.random.PRNGKey(SEED), jnp.asarray(feats0))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[train] EcapaTDNN{CHANNELS} params: {n_params:,}")

    # AAM-softmax classification head (train-only; not shipped)
    key = jax.random.PRNGKey(SEED + 1)
    head = jax.random.normal(key, (net.embed_dim, N_SPEAKERS)) * 0.05

    tx = optax.adamw(optax.cosine_decay_schedule(LR, N_STEPS, alpha=0.05),
                     weight_decay=1e-5)
    opt_state = tx.init({"net": params, "head": head})

    @jax.jit
    def step(state, opt_state, feats, labels):
        def loss_fn(s):
            emb = net.apply({"params": s["net"]}, feats)
            emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
            w = s["head"] / (
                jnp.linalg.norm(s["head"], axis=0, keepdims=True) + 1e-8
            )
            cos = emb @ w                                   # [B, S]
            onehot = jax.nn.one_hot(labels, N_SPEAKERS)
            # additive-angular margin on the target class
            theta = jnp.arccos(jnp.clip(cos, -1 + 1e-6, 1 - 1e-6))
            cos_m = jnp.cos(theta + MARGIN)
            logits = SCALE * (onehot * cos_m + (1 - onehot) * cos)
            loss = optax.softmax_cross_entropy(logits, onehot).mean()
            acc = (cos.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state)
        updates, opt_state = tx.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, loss, acc

    state = {"net": params, "head": head}
    t0 = time.time()
    for i in range(1, N_STEPS + 1):
        audio, labels = data.batch(BATCH)
        feats = _speaker_fbank(audio)
        state, opt_state, loss, acc = step(
            state, opt_state, jnp.asarray(feats), jnp.asarray(labels)
        )
        if i % 100 == 0 or i == 1:
            print(f"[train] step {i}/{N_STEPS} loss={float(loss):.4f} "
                  f"acc={float(acc):.3f} ({time.time() - t0:.0f}s)",
                  flush=True)

    OUT_PATH.parent.mkdir(parents=True, exist_ok=True)
    # fp16 storage halves the artifact; embeddings are cosine-compared, so
    # 1e-3-scale rounding is irrelevant
    half = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16), jax.device_get(state["net"])
    )
    OUT_PATH.write_bytes(serialization.to_bytes(half))
    print(f"[train] wrote {OUT_PATH} "
          f"({OUT_PATH.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
