"""Optimizer: 4-group LR/weight-decay split + schedules (optax).

Re-designed equivalent of the reference ``ASRTrainer.create_optimizer``
(``/root/reference/scripts/train.py:384-437``): parameters are labeled along
two axes — decoder (``language_model``) vs other, decay vs no-decay — with
per-group learning rate and weight decay, implemented as
``optax.multi_transform``.  Frozen towers get ``set_to_zero`` so the update
(and optimizer state memory) is elided entirely.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from tiny_audio_tpu.config import ASRConfig


@dataclass
class OptimizerConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    decoder_learning_rate: Optional[float] = None
    decoder_weight_decay: Optional[float] = None
    projector_weight_decay: Optional[float] = None
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "cosine"  # cosine | linear | polynomial | constant
    warmup_steps: int = 0
    warmup_ratio: float = 0.0
    total_steps: int = 10000
    polynomial_power: float = 0.5


# single source of truth — labeling and sharding must render identical
# path strings for the same tree
from tiny_audio_tpu.parallel.mesh import _path_str  # noqa: E402


def _is_no_decay(path: str) -> bool:
    last = path.rsplit("/", 1)[-1]
    return last == "bias" or "norm" in path.lower()


def param_labels(params: dict, config: ASRConfig) -> dict:
    """Label each leaf: frozen | {decoder,other}_{decay,nodecay}."""

    def label(path, leaf):
        p = _path_str(path)
        tower = p.split("/", 1)[0]
        if tower == "encoder":
            return "frozen"
        if tower == "decoder":
            is_lora = "lora" in p
            if config.freeze_language_model and not is_lora:
                return "frozen"
            group = "decoder"
        else:  # projector
            if config.freeze_projector:
                return "frozen"
            group = "other"
        return f"{group}_{'nodecay' if _is_no_decay(p) else 'decay'}"

    return jax.tree_util.tree_map_with_path(label, params)


def make_schedule(opt: OptimizerConfig, base_lr: float):
    warmup = opt.warmup_steps or int(opt.warmup_ratio * opt.total_steps)
    decay_steps = max(opt.total_steps - warmup, 1)
    if opt.lr_scheduler_type == "cosine":
        main = optax.cosine_decay_schedule(base_lr, decay_steps)
    elif opt.lr_scheduler_type == "linear":
        main = optax.linear_schedule(base_lr, 0.0, decay_steps)
    elif opt.lr_scheduler_type == "polynomial":
        main = optax.polynomial_schedule(
            base_lr, 0.0, opt.polynomial_power, decay_steps
        )
    elif opt.lr_scheduler_type == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"Unknown scheduler: {opt.lr_scheduler_type}")
    if warmup > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup), main], [warmup]
        )
    return main


def build_optimizer(config: ASRConfig, opt: OptimizerConfig, params: dict):
    """(optimizer, labels).  AdamW per group with its own LR schedule/WD,
    global grad clipping, zero-updates for frozen leaves."""
    base_lr = opt.learning_rate
    dec_lr = opt.decoder_learning_rate if opt.decoder_learning_rate is not None else base_lr
    base_wd = opt.weight_decay
    dec_wd = opt.decoder_weight_decay if opt.decoder_weight_decay is not None else base_wd
    proj_wd = opt.projector_weight_decay if opt.projector_weight_decay is not None else base_wd

    def adamw(lr, wd):
        return optax.adamw(
            make_schedule(opt, lr),
            b1=opt.adam_beta1,
            b2=opt.adam_beta2,
            eps=opt.adam_epsilon,
            weight_decay=wd,
        )

    transforms = {
        "other_decay": adamw(base_lr, proj_wd),
        "other_nodecay": adamw(base_lr, 0.0),
        "decoder_decay": adamw(dec_lr, dec_wd),
        "decoder_nodecay": adamw(dec_lr, 0.0),
        "frozen": optax.set_to_zero(),
    }
    labels = param_labels(params, config)
    tx = optax.chain(
        optax.clip_by_global_norm(opt.max_grad_norm),
        optax.multi_transform(transforms, labels),
    )
    # Non-finite-gradient guard: a NaN/Inf batch skips the update instead of
    # poisoning params + optimizer state forever (the failure mode the
    # reference defends against with data filters alone, train.py:284-291).
    # CAUTION: after max_consecutive_errors optax APPLIES the bad update —
    # it does not raise — so the Trainer separately watches the loss stream
    # and aborts on a sustained NaN run before that can happen.
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx, labels


def make_train_step(model, tx, labels=None):
    """A donated, jittable train step closed over the model and optimizer.

    ``labels`` (from :func:`build_optimizer`): frozen leaves' gradients are
    zeroed BEFORE ``tx.update`` so they do not inflate
    ``clip_by_global_norm``.  compute_loss stop-gradients the towers but
    not a frozen PROJECTOR, whose real grads would otherwise scale down
    every trainable (e.g. LoRA) update — and diverge from the accumulation
    path, which zeroes frozen leaves already."""

    def train_step(params, opt_state, batch, rng):
        rng, drop, jit_r = jax.random.split(rng, 3)

        def loss_fn(p):
            loss, metrics = model.compute_loss(
                p, batch, train=True, rngs={"dropout": drop, "jitter": jit_r}
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if labels is not None:
            grads = jax.tree_util.tree_map(
                lambda g, lb: jnp.zeros_like(g) if lb == "frozen" else g,
                grads, labels,
            )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics, rng

    return train_step


def init_grad_accum(params: dict, labels: dict):
    """Trainable-only gradient accumulator: frozen leaves hold a scalar
    placeholder, so accumulating over the 1.2 GB frozen towers costs bytes,
    not gigabytes (vs ``optax.MultiSteps``, which shadows the full tree)."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda p, lb: (
            jnp.zeros(p.shape, jnp.float32) if lb != "frozen"
            else jnp.zeros((), jnp.float32)
        ),
        params, labels,
    )


def make_accum_steps(model, tx, labels, accum_steps: int):
    """(accumulate_step, update_step) pair for gradient accumulation.

    ``accumulate_step`` adds the micro-batch gradient into the trainable-only
    accumulator; ``update_step`` additionally applies the optimizer to the
    accumulated MEAN (clipping therefore acts on the averaged gradient,
    matching HF/optax-MultiSteps semantics) and resets the accumulator.
    The caller alternates them on the host — which step runs is static, so
    there is no ``lax.cond`` in the compiled graph.
    """
    import jax.numpy as jnp

    inv = 1.0 / float(accum_steps)

    def _grads(params, batch, rng):
        rng, drop, jit_r = jax.random.split(rng, 3)

        def loss_fn(p):
            return model.compute_loss(
                p, batch, train=True, rngs={"dropout": drop, "jitter": jit_r}
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, metrics, grads, rng

    def _accumulate(accum, grads):
        return jax.tree_util.tree_map(
            lambda a, g, lb: a + g.astype(jnp.float32) if lb != "frozen" else a,
            accum, grads, labels,
        )

    def accumulate_step(params, opt_state, accum, batch, rng):
        loss, metrics, grads, rng = _grads(params, batch, rng)
        return params, opt_state, _accumulate(accum, grads), loss, metrics, rng

    def update_step(params, opt_state, accum, batch, rng):
        loss, metrics, grads, rng = _grads(params, batch, rng)
        accum = _accumulate(accum, grads)
        mean = jax.tree_util.tree_map(
            lambda a, g, lb: (
                (a * inv).astype(g.dtype) if lb != "frozen"
                else jnp.zeros_like(g)  # set_to_zero leaves; norm-contrib 0
            ),
            accum, grads, labels,
        )
        metrics["grad_norm"] = optax.global_norm(mean)
        updates, opt_state = tx.update(mean, opt_state, params)
        params = optax.apply_updates(params, updates)
        accum = jax.tree_util.tree_map(
            lambda a, lb: jnp.zeros_like(a) if lb != "frozen" else a,
            accum, labels,
        )
        return params, opt_state, accum, loss, metrics, rng

    return accumulate_step, update_step
