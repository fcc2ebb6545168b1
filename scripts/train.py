#!/usr/bin/env python3
"""Training entrypoint: config composition -> model -> data -> Trainer.

Re-designed equivalent of ``/root/reference/scripts/train.py:479-655``
(Hydra ``main``): composes ``configs/`` with ``+experiments=`` overlays and
dotted overrides, builds the model (fresh or from a checkpoint), wires
host-side augmentation + silence injection, picks the (multitask) collator,
and runs the JAX :class:`~tiny_audio_tpu.train.trainer.Trainer`.

Usage:
    python scripts/train.py +experiments=smoke
    python scripts/train.py +experiments=transcription training.max_steps=100
    python scripts/train.py model.projector_type=moe run.output_dir=outputs/moe
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def build_model(cfg: dict):
    """ASRConfig from the composed tree (+ tiny-tower smoke mode)."""
    import dataclasses

    from tiny_audio_tpu.config import ASRConfig, tiny_test_config
    from tiny_audio_tpu.models.asr import ASRModel
    from tiny_audio_tpu.tokenization import HFTokenizerAdapter

    run = cfg.get("run", {}) or {}
    model_cfg = dict(cfg.get("model", {}) or {})
    model_cfg.pop("defaults_note", None)

    if run.get("tiny_model"):
        asr_config = tiny_test_config(
            **{
                k: v
                for k, v in model_cfg.items()
                if k in {f.name for f in dataclasses.fields(ASRConfig)}
                and k not in ("encoder", "decoder")
            }
        )
    else:
        asr_config = ASRConfig.from_dict(model_cfg)

    tokenizer = None
    if run.get("tokenizer_path"):
        tokenizer = HFTokenizerAdapter.from_pretrained(run["tokenizer_path"])

    pretrained = run.get("pretrained_model_path")
    if pretrained:
        model = ASRModel.from_pretrained(pretrained, tokenizer=tokenizer)
        # training-stage fields (use_lora / freezing) come from the new config
        for key in (
            "use_lora", "lora_rank", "lora_alpha", "lora_target_modules",
            "freeze_projector", "freeze_language_model", "audio_token_dropout",
        ):
            if key in model_cfg:
                setattr(model.config, key, model_cfg[key])
        if model.config.use_lora:
            # rebuild with LoRA attached, reusing the loaded base weights
            rebuilt = ASRModel(model.config, tokenizer=model.tokenizer, seed=0)
            from tiny_audio_tpu.models.asr import merge_lora, split_lora

            _, lora = split_lora(rebuilt.params["decoder"])
            base, _ = split_lora(model.params["decoder"])
            rebuilt.params["encoder"] = model.params["encoder"]
            rebuilt.params["projector"] = model.params["projector"]
            rebuilt.params["decoder"] = merge_lora(base, lora)
            model = rebuilt
    else:
        model = ASRModel(asr_config, tokenizer=tokenizer, seed=int(run.get("seed", 0)))
    return model


def build_augmentation(train_cfg: dict):
    from tiny_audio_tpu.train.augmentation import (
        AugmentationPipeline,
        NoiseAugmentation,
        RIRAugmentation,
    )

    rir_cfg = train_cfg.get("rir_augmentation") or {}
    noise_cfg = train_cfg.get("noise_augmentation") or {}
    silence_p = float(train_cfg.get("silence_injection_prob") or 0.0)

    rir = (
        RIRAugmentation(rir_dir=rir_cfg.get("rir_dir"), p=float(rir_cfg.get("p", 0.5)))
        if rir_cfg.get("enabled")
        else None
    )
    noise = (
        NoiseAugmentation(
            noise_dir=noise_cfg.get("noise_dir"),
            transient_dir=noise_cfg.get("transient_dir"),
        )
        if noise_cfg.get("enabled") or silence_p > 0
        else None
    )
    if rir is None and noise is None:
        return None
    return AugmentationPipeline(
        rir=rir, noise=noise, silence_injection_prob=silence_p
    )


def main(argv=None) -> dict:
    import dataclasses

    from tiny_audio_tpu.train.collator import DataCollator, MultiTaskDataCollator
    from tiny_audio_tpu.train.config_loader import load_config
    from tiny_audio_tpu.train.data import DatasetLoader
    from tiny_audio_tpu.train.optim import OptimizerConfig
    from tiny_audio_tpu.train.trainer import Trainer, TrainingConfig

    argv = list(sys.argv[1:] if argv is None else argv)
    config_dir = REPO_ROOT / "configs"
    cfg = load_config(config_dir, argv)
    run = cfg.get("run", {}) or {}
    train_cfg = dict(cfg.get("training", {}) or {})

    model = build_model(cfg)
    print(
        f"[train] projector={model.config.projector_type} "
        f"lora={model.config.use_lora} "
        f"freeze_lm={model.config.freeze_language_model}"
    )

    train_rows, eval_rows = DatasetLoader(
        cfg.get("data"), seed=int(run.get("seed", 0))
    ).load()
    print(f"[train] {len(train_rows)} train rows, "
          f"{len(eval_rows) if eval_rows else 0} eval rows")

    # Exact multitask detection via spec metadata — no row walk, no audio
    # decode (a 64-row shuffled sample once missed small task minorities
    # ~half the time, silently training sift rows with the transcribe
    # prompt)
    data_cfg = cfg.get("data") or {}
    multitask = any(
        ds.get("task") for ds in data_cfg.get("datasets", [])
        if isinstance(ds, dict)
    ) or getattr(train_rows, "has_tasks", False)
    collator_cls = MultiTaskDataCollator if multitask else DataCollator
    collator = collator_cls(
        model.tokenizer,
        model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins,
        system_prompt=model.config.system_prompt,
        encoder_conv_layers=model.config.encoder_conv_layers,
    )

    opt_fields = {f.name for f in dataclasses.fields(OptimizerConfig)}
    tc_fields = {f.name for f in dataclasses.fields(TrainingConfig)}
    optimizer = OptimizerConfig(
        **{k: v for k, v in train_cfg.items() if k in opt_fields}
    )
    training = TrainingConfig(
        output_dir=str(run.get("output_dir", "outputs/run")),
        optimizer=optimizer,
        seed=int(run.get("seed", 0)),
        **{
            k: v
            for k, v in train_cfg.items()
            if k in tc_fields and k not in ("optimizer", "seed", "output_dir")
        },
    )

    callbacks = []
    if run.get("push_to_hub_repo"):
        from tiny_audio_tpu.hub import PushToHubCallback

        callbacks.append(PushToHubCallback(run["push_to_hub_repo"]))

    trainer = Trainer(
        model,
        training,
        train_rows,
        collator,
        eval_dataset=eval_rows,
        transform=build_augmentation(train_cfg),
        callbacks=callbacks,
    )
    result = trainer.train()
    model.save_pretrained(Path(training.output_dir) / "model")
    # final Hub push (reference train.py:644-651, suppressed failures)
    if run.get("push_to_hub_repo"):
        import contextlib

        from tiny_audio_tpu.hub import push_to_hub

        with contextlib.suppress(Exception):
            push_to_hub(Path(training.output_dir) / "model",
                        run["push_to_hub_repo"])
    print(f"[train] done: {result}")
    return result


if __name__ == "__main__":
    main()
