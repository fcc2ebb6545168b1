"""Full-lifecycle integration: train smoke -> checkpoint -> eval CLI ->
analysis -> artifact staging -> serving.  One chained test so interface
drift between subsystems fails loudly (the reference's closest analogue is
the mps_smoke end-to-end run, SURVEY.md §4)."""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_train_eval_serve_lifecycle(tmp_path):
    # ---- 1. train a tiny model for a few steps
    from tiny_audio_tpu.config import tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.train.collator import DataCollator
    from tiny_audio_tpu.train.data import synthetic_dataset
    from tiny_audio_tpu.train.optim import OptimizerConfig
    from tiny_audio_tpu.train.trainer import Trainer, TrainingConfig

    model = ASRModel(tiny_test_config(model_dtype="float32"), seed=0)
    collator = DataCollator(
        model.tokenizer, model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins,
    )
    rows = synthetic_dataset(8, seed=0, min_s=0.3, max_s=0.6)
    run_dir = tmp_path / "run"
    trainer = Trainer(
        model,
        TrainingConfig(
            output_dir=str(run_dir), max_steps=2, per_device_batch_size=1,
            logging_steps=1, save_steps=2, eval_steps=0,
            optimizer=OptimizerConfig(total_steps=2, warmup_steps=0,
                                      lr_scheduler_type="constant"),
        ),
        rows, collator,
    )
    result = trainer.train()
    assert result["final_step"] == 2
    ckpt = run_dir / "model"
    # trainer saves trainable-only; add towers for standalone reload
    trainer.model.save_pretrained(ckpt, save_towers=True)
    assert (ckpt / "config.json").exists()

    # metrics.jsonl written and parseable
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert lines and "loss" in json.loads(lines[0])

    # ---- 2. eval through the CLI dispatch on the saved checkpoint
    from tiny_audio_tpu.eval.cli import run_eval

    metrics = run_eval(
        str(ckpt), "synthetic", num_samples=2,
        output_dir=str(tmp_path / "outputs"),
    )
    assert metrics["num_samples"] == 2

    # ---- 3. analysis parses the eval artifacts
    from tiny_audio_tpu.analysis import find_latest_results, parse_results_file

    results_file = find_latest_results(str(tmp_path / "outputs"))
    assert results_file is not None
    parsed = parse_results_file(results_file)
    assert len(parsed) == 2

    # ---- 4. artifact staging makes the checkpoint self-contained
    from tiny_audio_tpu.hub import stage_artifact

    stage_artifact(ckpt)
    assert (ckpt / "tiny_audio_tpu" / "models" / "asr.py").exists()

    # ---- 5. serving: reload from disk, handle a request
    from tiny_audio_tpu.handler import EndpointHandler

    handler = EndpointHandler(str(ckpt))
    out = handler(
        {"inputs": np.zeros(8000, np.float32),
         "parameters": {"return_timestamps": True}}
    )
    assert "text" in out and "words" in out

    # ---- 6. debug tools run against the trained checkpoint
    from tiny_audio_tpu.debug import analyze_weights, check_gradient_flow

    loaded = ASRModel.from_pretrained(ckpt)
    report = check_gradient_flow(loaded)
    assert report["ok"], report["problems"]
    weights = analyze_weights(loaded.params)
    assert weights["projector"]["nonfinite"] == 0
