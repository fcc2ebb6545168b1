"""Run the offline convergence benchmark (VERDICT r3 #1: prove the
training stack LEARNS) and print the summary JSON.

The ladder (tiny_audio_tpu/train/convergence.py): CTC encoder pretrain ->
decoder warmup (labeled speech, frozen random projector) -> stage-1 projector-only -> stage-2 LoRA, all through
the real Trainer/collator/optimizer, measuring held-out greedy-decode WER
(unseen voices AND unseen word sequences) between stages.

Run (CPU is fine; the tiny towers train in minutes):
    JAX_PLATFORMS=cpu python scripts/run_convergence.py --out runs/convergence
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/convergence")
    ap.add_argument("--n-train", type=int, default=384)
    ap.add_argument("--ctc-steps", type=int, default=2000)
    ap.add_argument("--warmup-steps", type=int, default=600)
    ap.add_argument("--s1-steps", type=int, default=500)
    ap.add_argument("--s2-steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-encoder", default=None,
                    help="save the CTC-pretrained encoder (msgpack) here — "
                    "feeds tests/test_convergence_gate.py")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tiny_audio_tpu.train.convergence import run_convergence_ladder

    rec = run_convergence_ladder(
        args.out,
        n_train=args.n_train,
        ctc_steps=args.ctc_steps,
        warmup_steps=args.warmup_steps,
        s1_steps=args.s1_steps,
        s2_steps=args.s2_steps,
        seed=args.seed,
        save_encoder_path=args.save_encoder,
    )
    print(json.dumps(
        {k: rec[k] for k in (
            "ctc_token_error_rate", "wer_init", "wer_warmup",
            "wer_s1", "wer_s2", "eval_loss_warmup", "eval_loss_s1",
            "eval_loss_s2", "phase_seconds",
        )},
        indent=2,
    ))


if __name__ == "__main__":
    main()
