"""Measure the training ladder at flagship size on one chip.

VERDICT r2 weak-#4: stage-1 (projector-only) was measured at 227 ms/step
but stage-2 (LoRA, ``mlp_lora.yaml``) and stage-3 (full decoder,
``embedded.yaml`` — reference ``scripts/train.py:368-437`` ladder) had
configs and unit tests but no flagship-size step-time or HBM numbers; in
particular nobody had checked whether the 1.2B-tower backward + optimizer
state FITS one chip for stage 3.

Each stage runs in a SUBPROCESS (fresh HBM) building the full-size model
with random weights (throughput is weight-value-independent), one compile
step + 5 timed steps on a synthetic batch, reporting median step ms,
samples/s, peak HBM, and trainable-parameter count.

Run from the repo root (each stage compiles for minutes cold):

    python - < scripts/bench_train_stages.py            # all three stages
    TA_STAGE=stage3 python - < scripts/bench_train_stages.py   # just one

Results are recorded in docs/performance.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

STAGES = {
    # (config overrides, batch size, grad checkpointing)
    "stage1_projector": {"overrides": {}, "batch": 6},
    "stage2_lora": {
        "overrides": {"use_lora": True, "lora_rank": 8, "lora_alpha": 32,
                      "freeze_projector": True},
        "batch": 6,
    },
    "stage3_full_decoder": {
        "overrides": {"freeze_language_model": False,
                      "gradient_checkpointing": True},
        "batch": 6,
    },
}

_CHILD_CODE = r"""
import json, os, sys, time
import numpy as np

import jax
import jax.numpy as jnp

from tiny_audio_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

stage = json.loads(os.environ["TA_STAGE_SPEC"])

from tiny_audio_tpu.config import ASRConfig
from tiny_audio_tpu.models.asr import ASRModel
from tiny_audio_tpu.processing import ASRProcessor
from tiny_audio_tpu.train.optim import (
    OptimizerConfig, build_optimizer, make_train_step,
)

cfg = ASRConfig()
for k, v in stage["overrides"].items():
    setattr(cfg, k, v)
cfg.__post_init__()
model = ASRModel(cfg, seed=0)

tx, labels = build_optimizer(
    cfg, OptimizerConfig(total_steps=100, decoder_learning_rate=1e-4),
    model.params,
)
opt_state = tx.init(model.params)
train_step = jax.jit(make_train_step(model, tx, labels), donate_argnums=(0, 1))

n_trainable = 0
flat_params = jax.tree_util.tree_leaves_with_path(model.params)
flat_labels = jax.tree_util.tree_leaves_with_path(labels)
for (pp, pv), (lp, lv) in zip(flat_params, flat_labels):
    if lv != "frozen":
        n_trainable += pv.size

# synthetic 10 s production batch (bucketed mel, chat-templated rows)
b = stage["batch"]
rng = np.random.default_rng(0)
proc = ASRProcessor(
    model.tokenizer, projector=model.projector,
    num_mel_bins=cfg.encoder.num_mel_bins,
)
audio = [(0.1 * rng.standard_normal(10 * 16000)).astype(np.float32)
         for _ in range(b)]
feats = proc.extract_features(audio)
n = int(proc.num_audio_tokens(int(feats["mel_lengths"][0])))
row = np.asarray(
    proc.tokenizer.apply_chat_template(
        proc.build_messages(n, text="the quick brown fox jumps over the dog"),
        tokenize=True, add_generation_prompt=False,
    ),
    np.int32,
)
input_ids = np.tile(row, (b, 1))
lab = np.where(input_ids == proc.tokenizer.pad_token_id, -100, input_ids)
batch = {
    "input_ids": jnp.asarray(input_ids),
    "attention_mask": jnp.ones_like(jnp.asarray(input_ids)),
    "labels": jnp.asarray(lab),
    "input_features": jnp.asarray(feats["input_features"]),
    "audio_attention_mask": jnp.asarray(feats["audio_attention_mask"]),
}

params, opt = model.params, opt_state
key = jax.random.PRNGKey(0)

t0 = time.time()
params, opt, loss, metrics, key = train_step(params, opt, batch, key)
float(loss)
compile_s = time.time() - t0

from tiny_audio_tpu.utils.profiling import block_until_ready_via_host

laps = []
for _ in range(5):
    t0 = time.time()
    params, opt, loss, metrics, key = train_step(params, opt, batch, key)
    block_until_ready_via_host(loss)
    laps.append(time.time() - t0)

stats = jax.local_devices()[0].memory_stats() or {}
print("RESULT " + json.dumps({
    "stage": stage["name"],
    "batch": b,
    "step_ms": round(float(np.median(laps)) * 1000, 1),
    "samples_per_s": round(b / float(np.median(laps)), 2),
    "compile_s": round(compile_s, 1),
    "trainable_params_m": round(n_trainable / 1e6, 2),
    "loss": round(float(loss), 3),
    "peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
    "hbm_limit_gb": round(stats.get("bytes_limit", 0) / 2**30, 2),
}))
"""


def main() -> None:
    only = os.environ.get("TA_STAGE")
    results = []
    for name, spec in STAGES.items():
        if only and only not in name:
            continue
        env = dict(
            os.environ,
            TA_STAGE_SPEC=json.dumps({"name": name, **spec}),
        )
        print(f"[stages] running {name} (compile may take minutes)...",
              flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD_CODE], env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")),
            None,
        )
        if line is None:
            tail = (proc.stdout + proc.stderr)[-2000:]
            print(f"[stages] {name} FAILED (rc={proc.returncode}):\n{tail}")
            results.append({"stage": name, "error": f"rc={proc.returncode}"})
            continue
        res = json.loads(line[len("RESULT "):])
        print(f"[stages] {name}: {res}")
        results.append(res)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
