"""Debug tools: router health, gradient flow, weight health, LoRA analysis.

Re-designed equivalent of ``/root/reference/scripts/debug/*`` (2,120 LoC):

- :func:`check_router_health` — run real/synthetic audio through a MoE/MOSA
  checkpoint and compare routing-probability statistics against health
  targets: normalized entropy in [0.6, 0.85], per-expert mean usage in
  [10 %, 40 %], collapse detection (reference check_mosa.py:22-30,
  check_moe.py:21-116).
- :func:`check_gradient_flow` — one synthetic forward/backward: per-module
  gradient norms, frozen-encoder leak check, NaN/Inf scan
  (reference check_gradient_flow.py:1-40).
- :func:`analyze_weights` — static health: norms / zero-fraction / outliers
  per tower (reference analyze_weights.py).
- :func:`analyze_lora` — per-target ||B @ A|| adapter effectiveness
  (reference analyze_lora.py).
- :func:`compare_to_base` — per-component weight drift between two
  checkpoints (reference compare_to_base.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

ENTROPY_HEALTH = (0.60, 0.85)  # fraction of max entropy (reference targets)
USAGE_HEALTH = (0.10, 0.40)


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, tree


# ------------------------------------------------------------- router health


def router_stats(probs: np.ndarray) -> dict:
    """[N, E] routing probabilities -> health statistics."""
    probs = np.asarray(probs, np.float64).reshape(-1, probs.shape[-1])
    n, e = probs.shape
    entropy = -(probs * np.log(probs + 1e-12)).sum(axis=1).mean()
    max_entropy = np.log(e)
    usage = probs.mean(axis=0)
    top1 = probs.argmax(axis=1)
    top1_share = np.bincount(top1, minlength=e) / n
    return {
        "normalized_entropy": float(entropy / max_entropy),
        "per_expert_usage": usage.tolist(),
        "top1_share": top1_share.tolist(),
        "collapsed": bool(top1_share.max() > 0.9),
        "entropy_healthy": ENTROPY_HEALTH[0]
        <= entropy / max_entropy
        <= ENTROPY_HEALTH[1],
        "usage_healthy": bool(
            (usage >= USAGE_HEALTH[0]).all() and (usage <= USAGE_HEALTH[1]).all()
        ),
    }


def check_router_health(model, audio: Optional[np.ndarray] = None,
                        seconds: float = 4.0) -> dict:
    """Run audio through the model's projector and report routing health.
    Requires projector_type in {"moe", "mosa"}."""
    import jax.numpy as jnp

    if model.config.projector_type not in ("moe", "mosa"):
        raise ValueError(
            f"router health needs a moe/mosa projector, got "
            f"{model.config.projector_type!r}"
        )
    if audio is None:
        rng = np.random.default_rng(0)
        t = np.arange(int(seconds * 16000)) / 16000
        audio = (0.2 * np.sin(2 * np.pi * 160 * t)
                 + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    from tiny_audio_tpu.processing import ASRProcessor

    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins,
        encoder_conv_layers=model.config.encoder_conv_layers,
    )
    feats = proc.extract_features(audio)
    hidden = model.encoder.apply(
        {"params": model.params["encoder"]},
        jnp.asarray(feats["input_features"]),
        frame_mask=jnp.asarray(feats["audio_attention_mask"]),
    )
    _, state = model.projector.apply(
        {"params": model.params["projector"]}, hidden, train=False,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]
    # sown under .../router_probs as a tuple
    probs = None
    for path, leaf in _tree_paths(inter):
        if "router_probs" in path:
            probs = np.asarray(leaf[0] if isinstance(leaf, tuple) else leaf)
            break
    if probs is None:
        raise RuntimeError("no router_probs intermediates found")
    return router_stats(probs)


# ----------------------------------------------- attention-window calibration


def calibrate_attention_window(
    model, audio: Optional[np.ndarray] = None, seconds: float = 4.0
) -> dict:
    """Validate the encoder against the TPU kernel's softmax window.

    The Pallas encoder-attention kernel (ops/encoder_attention.py) uses a
    constant-shift softmax that is exact only while every attention row's max
    score lies inside ``[SOFTMAX_SHIFT - 87, SOFTMAX_CLAMP]`` — a property of
    the CHECKPOINT, not the code.  This pass runs real/synthetic audio
    through the encoder with per-layer score-range sowing and reports the
    observed extremes against the window (with the margin the shipped
    checkpoint family carries, ~4x on |s| <= 30).

    Returns a dict with per-layer ``[lo, hi]`` row-max ranges, the global
    range, the window, and ``ok``.  Called from checkpoint conversion
    (convert.convert_checkpoint) so an imported checkpoint with hotter
    logits fails loudly at import time instead of silently flattening rows
    on TPU.
    """
    import jax.numpy as jnp

    from tiny_audio_tpu.ops.encoder_attention import (
        SOFTMAX_CLAMP,
        SOFTMAX_SHIFT,
    )

    if audio is None:
        rng = np.random.default_rng(0)
        t = np.arange(int(seconds * 16000)) / 16000
        audio = (0.2 * np.sin(2 * np.pi * 160 * t)
                 + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    from tiny_audio_tpu.models.encoder import AudioEncoder
    from tiny_audio_tpu.processing import ASRProcessor

    proc = ASRProcessor(
        model.tokenizer, projector=model.projector,
        num_mel_bins=model.config.encoder.num_mel_bins,
        encoder_conv_layers=model.config.encoder_conv_layers,
    )
    feats = proc.extract_features(audio)
    enc = AudioEncoder(
        model.config.encoder, dtype=model.dtype, param_dtype=model.dtype,
        calibrate=True,
    )
    _, state = enc.apply(
        {"params": model.params["encoder"]},
        jnp.asarray(feats["input_features"]),
        frame_mask=jnp.asarray(feats["audio_attention_mask"]),
        mutable=["intermediates"],
    )
    ranges = None
    for path, leaf in _tree_paths(state["intermediates"]):
        if "attn_row_max_range" in path:
            ranges = np.asarray(
                leaf[0] if isinstance(leaf, tuple) else leaf, np.float64
            )  # [L, 2]
            break
    if ranges is None:
        raise RuntimeError("no attn_row_max_range intermediates found")
    window = (float(SOFTMAX_SHIFT) - 87.0, float(SOFTMAX_CLAMP))
    lo, hi = float(ranges[:, 0].min()), float(ranges[:, 1].max())
    return {
        "per_layer": ranges.tolist(),
        "row_max_lo": lo,
        "row_max_hi": hi,
        "window": list(window),
        "ok": bool(window[0] <= lo and hi <= window[1]),
    }


# ------------------------------------------------------------- gradient flow


def check_gradient_flow(model, batch: Optional[dict] = None) -> dict:
    """One synthetic fwd/bwd: per-tower grad norms + leak/NaN checks."""
    import jax
    import jax.numpy as jnp

    if batch is None:
        rng = np.random.default_rng(0)
        b, t_mel = 2, 50
        feats = rng.standard_normal(
            (b, model.config.encoder.num_mel_bins, t_mel)
        ).astype(np.float32)
        ids = np.asarray(
            model.build_prompt_ids(model._num_audio_tokens(t_mel)) + [5, 6, 7],
            np.int32,
        )[None].repeat(b, 0)
        labels = np.full_like(ids, -100)
        labels[:, -3:] = ids[:, -3:]
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones_like(jnp.asarray(ids)),
            "labels": jnp.asarray(labels),
            "input_features": jnp.asarray(feats),
            "audio_attention_mask": jnp.ones((b, t_mel), jnp.int32),
        }

    def loss_fn(p):
        loss, _ = model.compute_loss(p, batch, train=False)
        return loss

    grads = jax.grad(loss_fn)(model.params)

    report: dict = {"module_grad_norms": {}, "problems": []}
    for path, leaf in _tree_paths(grads):
        arr = np.asarray(leaf, np.float32)
        norm = float(np.linalg.norm(arr))
        top = path.split("/")[0]
        report["module_grad_norms"].setdefault(top, 0.0)
        report["module_grad_norms"][top] += norm ** 2
        if not np.isfinite(arr).all():
            report["problems"].append(f"non-finite grad at {path}")
    report["module_grad_norms"] = {
        k: float(np.sqrt(v)) for k, v in report["module_grad_norms"].items()
    }

    if report["module_grad_norms"].get("encoder", 0.0) > 1e-8:
        report["problems"].append("frozen encoder received gradient (leak)")
    if model.config.freeze_language_model:
        dec = 0.0
        for path, leaf in _tree_paths(grads["decoder"]):
            if "lora" not in path:
                dec += float(np.linalg.norm(np.asarray(leaf, np.float32))) ** 2
        if dec > 1e-8:
            report["problems"].append("frozen LM base received gradient (leak)")
    if report["module_grad_norms"].get("projector", 0.0) < 1e-10 and not (
        model.config.freeze_projector
    ):
        report["problems"].append("projector received no gradient")
    report["ok"] = not report["problems"]
    return report


# ------------------------------------------------------------ weight health


def analyze_weights(params) -> dict:
    """Per-tower static stats: rms, zero fraction, outlier fraction."""
    report = {}
    for path, leaf in _tree_paths(params):
        arr = np.asarray(leaf, np.float32)
        tower = path.split("/")[0]
        entry = report.setdefault(
            tower, {"n_params": 0, "sumsq": 0.0, "zeros": 0, "outliers": 0,
                    "nonfinite": 0}
        )
        entry["n_params"] += arr.size
        entry["sumsq"] += float((arr.astype(np.float64) ** 2).sum())
        entry["zeros"] += int((arr == 0).sum())
        entry["nonfinite"] += int((~np.isfinite(arr)).sum())
        std = arr.std() or 1.0
        entry["outliers"] += int((np.abs(arr - arr.mean()) > 6 * std).sum())
    for entry in report.values():
        n = max(entry["n_params"], 1)
        entry["rms"] = float(np.sqrt(entry["sumsq"] / n))
        entry["zero_fraction"] = entry["zeros"] / n
        entry["outlier_fraction"] = entry["outliers"] / n
        del entry["sumsq"], entry["zeros"], entry["outliers"]
    return report


def analyze_lora(params) -> dict:
    """Per-target effective update magnitude ||B|| * ||A|| (scaled)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params.get("decoder", params))
    report = {}
    for key, leaf in flat.items():
        name = "/".join(str(k) for k in key)
        if name.endswith("_lora_a"):
            target = name[: -len("_lora_a")]
            b_key = key[:-1] + (key[-1].replace("_lora_a", "_lora_b"),)
            if b_key in flat:
                a = np.asarray(leaf, np.float32)
                b = np.asarray(flat[b_key], np.float32)
                report[target] = {
                    "a_norm": float(np.linalg.norm(a)),
                    "b_norm": float(np.linalg.norm(b)),
                    "delta_norm": float(np.linalg.norm(a) * np.linalg.norm(b)),
                    "b_is_zero": bool(np.abs(b).max() == 0),
                }
    return report


def compare_to_base(params_a, params_b) -> dict:
    """Per-component relative weight drift between two checkpoints."""
    report = {}
    flat_a = dict(_tree_paths(params_a))
    flat_b = dict(_tree_paths(params_b))
    for path in sorted(set(flat_a) & set(flat_b)):
        a = np.asarray(flat_a[path], np.float32)
        b = np.asarray(flat_b[path], np.float32)
        if a.shape != b.shape:
            report[path] = {"shape_mismatch": True}
            continue
        base = float(np.linalg.norm(a)) or 1.0
        drift = float(np.linalg.norm(a - b)) / base
        if drift > 0:
            report[path] = {"relative_drift": drift}
    return report


# --------------------------------------------------------------------- CLI


def add_debug_parser(subparsers) -> None:
    p = subparsers.add_parser("debug", help="Model debugging tools")
    sp = p.add_subparsers(dest="debug_cmd", required=True)

    for cmd in ("check-moe", "check-mosa"):
        c = sp.add_parser(cmd)
        c.add_argument("-m", "--model", required=True)
        c.set_defaults(func=_cmd_router)

    g = sp.add_parser("check-gradient-flow")
    g.add_argument("-m", "--model", required=True)
    g.set_defaults(func=_cmd_gradient)

    w = sp.add_parser("analyze-weights")
    w.add_argument("-m", "--model", required=True)
    w.set_defaults(func=_cmd_weights)

    lo = sp.add_parser("analyze-lora")
    lo.add_argument("-m", "--model", required=True)
    lo.set_defaults(func=_cmd_lora)

    cb = sp.add_parser("compare-to-base")
    cb.add_argument("-m", "--model", required=True)
    cb.add_argument("-b", "--base", required=True)
    cb.set_defaults(func=_cmd_compare)

    aw = sp.add_parser(
        "attn-window",
        help="Check encoder scores fit the TPU kernel's softmax window",
    )
    aw.add_argument("-m", "--model", required=True)
    aw.set_defaults(func=_cmd_attn_window)


def _load(path):
    from tiny_audio_tpu.models.asr import ASRModel

    return ASRModel.from_pretrained(path)


def _print_dict(d, indent=0):
    for k, v in d.items():
        if isinstance(v, dict):
            print("  " * indent + f"{k}:")
            _print_dict(v, indent + 1)
        else:
            print("  " * indent + f"{k}: {v}")


def _cmd_router(args) -> int:
    report = check_router_health(_load(args.model))
    _print_dict(report)
    healthy = report["entropy_healthy"] and report["usage_healthy"] and not report["collapsed"]
    print("HEALTHY" if healthy else "UNHEALTHY")
    return 0 if healthy else 1


def _cmd_gradient(args) -> int:
    report = check_gradient_flow(_load(args.model))
    _print_dict(report)
    return 0 if report["ok"] else 1


def _cmd_weights(args) -> int:
    _print_dict(analyze_weights(_load(args.model).params))
    return 0


def _cmd_lora(args) -> int:
    _print_dict(analyze_lora(_load(args.model).params))
    return 0


def _cmd_attn_window(args) -> int:
    report = calibrate_attention_window(_load(args.model))
    _print_dict({k: v for k, v in report.items() if k != "per_layer"})
    print("OK" if report["ok"] else "OUT OF WINDOW")
    return 0 if report["ok"] else 1


def _cmd_compare(args) -> int:
    report = compare_to_base(_load(args.base).params, _load(args.model).params)
    for path, row in sorted(report.items(), key=lambda kv: -kv[1].get("relative_drift", 0))[:40]:
        _print_dict({path: row})
    return 0
