#!/usr/bin/env python3
"""Benchmark: end-to-end ASR inference throughput on one TPU chip.

Measures RTFx (seconds of audio processed per wall-clock second) for the
flagship model — GLM-ASR-Nano-class encoder (~630M) + Qwen3-0.6B-class
decoder (~600M), bf16, random weights (throughput does not depend on weight
values) — over batches of 30 s utterances with the full pipeline: mel
front-end -> encoder -> projector -> prompt splice -> KV-cached greedy decode
of the full ``max_new_tokens=128`` budget (no-EOS worst case; real decodes
stop earlier, so this is a conservative bound).

Baseline: the reference (torch, single A40) publishes no RTF numbers
(BASELINE.md).  We estimate its A40 batch-1 pipeline at ~20x realtime for 30 s
clips (0.6B greedy decode of 128 tokens at the A40's ~700 GB/s memory
ceiling plus encoder prefill); the driver target is >=5x A40 per chip,
so ``vs_baseline = rtfx / (5 * 20)`` — 1.0 means the 5x target is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

A40_RTFX_ESTIMATE = 20.0
TARGET_MULTIPLE = 5.0


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from tiny_audio_tpu.config import ASRConfig
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.ops import mel

    cfg = ASRConfig()
    model = ASRModel(cfg, seed=0)

    batch = 8
    clip_seconds = 30.0
    n_samples = int(clip_seconds * 16000)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((batch, n_samples)) * 0.1).astype(np.float32)

    n_frames = n_samples // mel.HOP_LENGTH
    lengths = np.full((batch,), n_samples)

    def run_once():
        feats = mel.log_mel_spectrogram(
            jnp.asarray(audio), num_mel_bins=cfg.encoder.num_mel_bins
        )
        mask = mel.frame_attention_mask(jnp.asarray(lengths), n_frames)
        tokens = model.generate(feats, mask)
        return np.asarray(tokens)

    # Warmup / compile
    t0 = time.time()
    run_once()
    compile_s = time.time() - t0

    # Timed runs
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        run_once()
    wall = (time.time() - t0) / iters

    rtfx = batch * clip_seconds / wall
    result = {
        "metric": f"rtfx_e2e_30s_b{batch}_decode{cfg.max_new_tokens}",
        "value": round(rtfx, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(rtfx / (TARGET_MULTIPLE * A40_RTFX_ESTIMATE), 3),
        "extra": {
            "batch": batch,
            "wall_s_per_batch": round(wall, 3),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
