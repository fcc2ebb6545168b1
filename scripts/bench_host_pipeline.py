#!/usr/bin/env python3
"""Host input-pipeline throughput: augmentation + collation samples/s.

The device step consumes ~26.5 samples/s at the production recipe (batch 6
x ga 3, docs/performance.md); the host must at least match it or training
becomes input-bound — the reference's documented bottleneck, which it
answers with 24 dataloader workers
(``/root/reference/configs/experiments/embedded.yaml:36-39``).  This bench
measures our chain (full RIR + noise augmentation -> mel extraction ->
chat-ML label masking) single-threaded and with the batch_iterator's
``transform_workers`` thread pool (numpy/FFT DSP releases the GIL).

Run on the training host: ``python scripts/bench_host_pipeline.py``.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEVICE_RATE = 26.5  # samples/s, stage-1 production recipe on one v5e chip


def build_rows(n: int, seconds: float = 15.0) -> list[dict]:
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        rows.append({
            "audio": {
                "array": (rng.standard_normal(int(seconds * 16000)) * 0.1)
                .astype(np.float32),
                "sampling_rate": 16000,
            },
            "text": "the quick brown fox jumps over the lazy dog " * 4,
        })
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--workers", type=int, default=0,
                    help="transform worker threads (0 = inline)")
    args = ap.parse_args()

    from tiny_audio_tpu.config import ASRConfig
    from tiny_audio_tpu.models.projectors import create_projector
    from tiny_audio_tpu.tokenization import ByteTokenizer
    from tiny_audio_tpu.train.augmentation import (
        AugmentationPipeline,
        NoiseAugmentation,
        RIRAugmentation,
    )
    from tiny_audio_tpu.train.collator import DataCollator
    from tiny_audio_tpu.train.trainer import batch_iterator

    cfg = ASRConfig()
    # byte tokenizer: same masking/collation code path, no HF download
    tokenizer = ByteTokenizer(cfg.decoder.vocab_size)
    projector = create_projector(cfg)
    transform = AugmentationPipeline(
        rir=RIRAugmentation(p=1.0),       # worst case: always convolve
        noise=NoiseAugmentation(),
        silence_injection_prob=0.05,
    )
    collator = DataCollator(
        tokenizer, projector, num_mel_bins=cfg.encoder.num_mel_bins,
        system_prompt=cfg.system_prompt,
    )
    rows = build_rows(args.rows, args.seconds)

    # stage timings, single-thread
    t0 = time.time()
    aug = [transform(r) for r in rows]
    t_aug = time.time() - t0
    t0 = time.time()
    for i in range(0, len(aug), args.batch_size):
        collator(aug[i:i + args.batch_size])
    t_col = time.time() - t0
    print(f"augment: {len(rows) / t_aug:7.1f} samples/s "
          f"({t_aug / len(rows) * 1e3:.1f} ms/sample)")
    print(f"collate: {len(rows) / t_col:7.1f} samples/s "
          f"({t_col / len(rows) * 1e3:.1f} ms/sample)")

    # full pipeline through batch_iterator (what training actually runs)
    for workers in sorted({0, args.workers, 4, 8}):
        it = batch_iterator(
            rows, collator, args.batch_size, epochs=1, transform=transform,
            transform_workers=workers,
        )
        t0 = time.time()
        n_batches = sum(1 for _ in it)
        dt = time.time() - t0
        rate = n_batches * args.batch_size / dt
        verdict = "OK" if rate >= DEVICE_RATE else "INPUT-BOUND"
        print(f"pipeline workers={workers}: {rate:7.1f} samples/s "
              f"(device needs {DEVICE_RATE}) {verdict}")


if __name__ == "__main__":
    main()
