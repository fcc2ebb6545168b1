"""Training loop: jitted sharded step, grad accumulation, Orbax checkpoints.

Re-designed equivalent of the reference's HF-Trainer stack
(``/root/reference/scripts/train.py:368-458,630-643``) as an explicit JAX
loop:

- one jitted train step over a (dp, tp) ``Mesh`` (single-device is the 1x1
  degenerate case) with donated params/opt-state;
- gradient accumulation with a trainable-only accumulator (48 MB for the
  12M projector instead of MultiSteps' full-tree ~4.8 GB shadow of the
  frozen towers); host-side alternation of accumulate/update steps keeps
  ``lax.cond`` out of the compiled graph;
- host-side batch assembly on a background prefetch thread so the TPU never
  waits on mel/tokenize work (the reference's documented CPU bottleneck,
  configs/experiments/embedded.yaml:36-39);
- Orbax ``CheckpointManager`` for step checkpoints + resume
  (``save_steps``/``save_total_limit``/``resume_from_checkpoint``,
  reference configs/training/production.yaml:44-51);
- early stopping on eval loss (reference train.py:630-641 callbacks);
- metrics to stdout + ``metrics.jsonl`` (+ W&B when installed), matching the
  reference's ``logging_steps`` cadence.
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tiny_audio_tpu.train.optim import OptimizerConfig, build_optimizer


@dataclass
class TrainingConfig:
    """HF ``TrainingArguments`` analogue (reference train.py:461-476)."""

    output_dir: str = "outputs/run"
    max_steps: int = 1000
    per_device_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    logging_steps: int = 25
    save_steps: int = 500
    save_total_limit: int = 5
    eval_steps: int = 500
    eval_batches: int = 16
    early_stopping_patience: int = 0  # 0 = disabled
    resume_from_checkpoint: bool = False
    group_by_length: bool = False
    seed: int = 0
    # mesh
    dp: Optional[int] = None
    tp: int = 1
    # optimizer (flattened into OptimizerConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    prefetch_depth: int = 2
    # transform (augmentation) thread-pool width — the reference's
    # dataloader_num_workers; 0 = inline.  scripts/bench_host_pipeline.py
    # measures whether the host sustains the device rate.
    dataloader_workers: int = 4
    log_to_wandb: bool = False
    wandb_project: str = "tiny-audio-tpu"


class _Prefetcher:
    """Background thread running the collator ahead of the device step.

    ``close()`` MUST be called when the consumer stops early (max_steps,
    early stopping): without it the producer blocks in ``q.put`` forever,
    the underlying generator's ``finally`` (transform-pool shutdown) never
    runs, and the queued device-resident batches stay referenced."""

    _STOP = object()

    def __init__(self, batch_iter: Iterable, depth: int = 2):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self._stop = False
        self._thread = threading.Thread(
            target=self._run, args=(iter(batch_iter),), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop:
            try:
                self.q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, it):
        try:
            for item in it:
                if not self._put(item):
                    break
        except BaseException as e:  # surface worker errors on the main thread
            self.error = e
        finally:
            if hasattr(it, "close"):  # run the generator's finally NOW
                it.close()
            self._put(self._STOP)

    def close(self) -> None:
        self._stop = True
        while True:  # unblock a producer waiting on a full queue
            try:
                self.q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=10)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._STOP:
                if self.error is not None:
                    raise self.error
                return
            yield item


def _audio_len(row: dict) -> int:
    audio = row.get("audio")
    arr = audio.get("array") if isinstance(audio, dict) else audio
    return 0 if arr is None else int(np.asarray(arr).shape[-1])


def batch_iterator(
    dataset,
    collator,
    batch_size: int,
    seed: int = 0,
    epochs: Optional[int] = None,
    transform: Optional[Callable[[dict], dict]] = None,
    drop_last: bool = True,
    group_by_length: bool = False,
    length_window: int = 50,
    transform_workers: int = 0,
):
    """Shuffled epoch loop -> collated numpy batches.

    ``dataset``: any sequence of feature dicts (HF map-style dataset works).
    ``transform``: per-sample augmentation applied on the host
    (the reference's ``with_transform`` wiring, train.py:558-587).
    ``group_by_length``: sort by audio length inside shuffled windows of
    ``length_window * batch_size`` samples and shuffle the resulting batch
    order — the reference's HF ``group_by_length`` (production.yaml), which
    on TPU also concentrates each batch into one mel bucket (less padding
    compute, fewer compiled shapes per step).
    ``transform_workers``: per-batch thread pool for the augmentation
    transform — the DSP is numpy/FFT (GIL-releasing), so threads scale it
    like the reference's dataloader workers
    (``/root/reference/configs/experiments/embedded.yaml:36-39``); measure
    with ``scripts/bench_host_pipeline.py``.
    """
    from tiny_audio_tpu.train.augmentation import set_sample_key

    pool = None
    if transform is not None and transform_workers > 0:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(transform_workers)
    rng = np.random.default_rng(seed)
    n = len(dataset)
    epoch = 0

    def run_transform(epoch, j, row):
        # pin the augmentation RNG stream to (epoch, dataset index) so the
        # draws a sample sees do not depend on pool scheduling or worker
        # count — fixed-seed runs augment identically at any parallelism
        set_sample_key((epoch, int(j)))
        try:
            return transform(row)
        finally:
            set_sample_key(None)

    try:
        while epochs is None or epoch < epochs:
            order = rng.permutation(n)
            if group_by_length:
                window = max(length_window * batch_size, batch_size)
                reordered = []
                for w in range(0, n, window):
                    idx = order[w : w + window]
                    lengths = np.array(
                        [
                            # LazyRows memoizes lengths: probing via
                            # dataset[j] would decode every clip twice/epoch
                            dataset.audio_len(int(j))
                            if hasattr(dataset, "audio_len")
                            else _audio_len(dataset[int(j)])
                            for j in idx
                        ]
                    )
                    reordered.append(idx[np.argsort(lengths, kind="stable")])
                order = np.concatenate(reordered)
                starts = np.arange(
                    0, n - (batch_size - 1 if drop_last else 0), batch_size
                )
                rng.shuffle(starts)
            else:
                starts = range(0, n - (batch_size - 1 if drop_last else 0),
                               batch_size)
            yielded = 0
            for i in starts:
                js = [int(j) for j in order[i : i + batch_size]]
                rows = [dataset[j] for j in js]
                if transform is not None:
                    if pool is not None:
                        rows = list(pool.map(
                            run_transform, [epoch] * len(js), js, rows
                        ))
                    else:
                        rows = [
                            run_transform(epoch, j, r)
                            for j, r in zip(js, rows)
                        ]
                try:
                    yield collator(rows)
                    yielded += 1
                except ValueError:
                    continue  # all rows in the batch were filtered out
            if yielded == 0:
                # would spin forever under epochs=None (e.g. dataset smaller
                # than the global batch with drop_last, or all filtered)
                raise ValueError(
                    f"batch_iterator produced no batches in an epoch "
                    f"({n} rows, batch_size={batch_size}, drop_last={drop_last})"
                )
            epoch += 1
    finally:
        if pool is not None:  # generator close/exhaustion must not leak threads
            pool.shutdown(wait=False)


class Trainer:
    """Explicit JAX training loop over an :class:`ASRModel`."""

    def __init__(
        self,
        model,
        config: TrainingConfig,
        train_dataset,
        collator,
        eval_dataset=None,
        transform: Optional[Callable[[dict], dict]] = None,
        callbacks: Optional[list] = None,
    ):
        self.model = model
        self.config = config
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.collator = collator
        self.transform = transform
        self.callbacks = callbacks or []
        self.out_dir = Path(config.output_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)

        # Persistent XLA compile cache: the sharded train/accum/update
        # graphs compile in minutes; a restarted (resumed) run should
        # reload them from disk, not re-trace the world.
        from tiny_audio_tpu.utils.compile_cache import (
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()

        # ---- mesh + sharded params
        from tiny_audio_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            param_shardings,
            shard_params,
        )

        n_dev = jax.device_count()
        tp = config.tp
        dp = config.dp if config.dp is not None else n_dev // tp
        self.mesh = make_mesh(dp=dp, tp=tp)
        self.model.params = shard_params(self.model.params, self.mesh)
        self._batch_sharding = batch_sharding(self.mesh)
        self._param_shardings = param_shardings(self.model.params, self.mesh)

        # ---- optimizer (+ grad accumulation)
        opt_cfg = dataclasses.replace(
            config.optimizer,
            total_steps=config.max_steps,
        )
        tx, self.param_labels = build_optimizer(model.config, opt_cfg, model.params)
        self.tx = tx
        self.opt_state = tx.init(model.params)

        self._accum = max(config.gradient_accumulation_steps, 1)
        if self._accum > 1:
            # Trainable-only accumulator (48 MB for a 12M projector) instead
            # of optax.MultiSteps, which shadows the frozen 1.2B towers
            # (~4.8 GB of accumulator HBM for leaves that update to zero).
            from tiny_audio_tpu.train.optim import init_grad_accum, make_accum_steps

            self.grad_accum = init_grad_accum(model.params, self.param_labels)
            acc_fn, upd_fn = make_accum_steps(
                model, tx, self.param_labels, self._accum
            )
            jit_args = dict(
                in_shardings=(self._param_shardings, None, None, None, None),
                out_shardings=(
                    self._param_shardings, None, None, None, None, None
                ),
                donate_argnums=(0, 1, 2),
            )
            self._accumulate_step = jax.jit(acc_fn, **jit_args)
            self._update_step = jax.jit(upd_fn, **jit_args)
            self._train_step = None
        else:
            self.grad_accum = None
            self._train_step = self._make_step()
        self._eval_step = jax.jit(
            lambda p, b: self.model.compute_loss(p, b, train=False)[1]
        )

        # ---- checkpointing
        import orbax.checkpoint as ocp

        self._ckpt_dir = (self.out_dir / "checkpoints").absolute()
        self._ckpt_mgr = ocp.CheckpointManager(
            self._ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=config.save_total_limit, create=True
            ),
        )
        self._metrics_file = self.out_dir / "metrics.jsonl"
        self._wandb = None
        if config.log_to_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=config.wandb_project, config=dataclasses.asdict(config)
                )
            except Exception:
                self._wandb = None

    # ------------------------------------------------------------------ step

    def _make_step(self):
        from tiny_audio_tpu.train.optim import make_train_step

        return jax.jit(
            make_train_step(self.model, self.tx, self.param_labels),
            in_shardings=(self._param_shardings, None, None, None),
            out_shardings=(self._param_shardings, None, None, None, None),
            donate_argnums=(0, 1),
        )

    # ------------------------------------------------------------ checkpoints

    _last_saved_step: int = -1

    def _save_checkpoint(self, step: int) -> None:
        import orbax.checkpoint as ocp

        tree = {
            "params": self.model.params,
            "opt_state": self.opt_state,
            "step": step,
        }
        self._ckpt_mgr.save(step, args=ocp.args.StandardSave(tree))
        self._ckpt_mgr.wait_until_finished()
        self._last_saved_step = step
        # model-level artifact (config + trainable weights) next to it
        self.model.save_pretrained(self.out_dir / "model", save_towers=False)
        for cb in self.callbacks:
            if hasattr(cb, "on_save"):
                cb.on_save(self, step)

    def _maybe_resume(self) -> int:
        if not self.config.resume_from_checkpoint:
            return 0
        latest = self._ckpt_mgr.latest_step()
        if latest is None:
            return 0
        import orbax.checkpoint as ocp

        target = {
            "params": self.model.params,
            "opt_state": self.opt_state,
            "step": 0,
        }
        restored = self._ckpt_mgr.restore(
            latest, args=ocp.args.StandardRestore(target)
        )
        # Re-place on the mesh: orbax restores committed to one device, which
        # conflicts with the jitted step's sharded param arguments.
        self.model.params = jax.tree_util.tree_map(
            jax.device_put, restored["params"], self._param_shardings
        )
        self.opt_state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), restored["opt_state"]
        )
        print(f"[trainer] resumed from step {latest}")
        self._last_saved_step = int(restored["step"])  # already on disk
        return int(restored["step"])

    # --------------------------------------------------------------- logging

    def _log(self, record: dict) -> None:
        record = {
            k: (float(v) if isinstance(v, (jax.Array, np.floating)) else v)
            for k, v in record.items()
        }
        with self._metrics_file.open("a") as f:
            f.write(json.dumps(record) + "\n")
        msg = "  ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(f"[trainer] {msg}", flush=True)
        if self._wandb is not None:
            self._wandb.log(record, step=record.get("step"))
        for cb in self.callbacks:
            if hasattr(cb, "on_log"):
                cb.on_log(self, record)

    # ------------------------------------------------------------------ eval

    def evaluate(self) -> dict:
        if self.eval_dataset is None:
            return {}
        losses, aux = [], []
        global_bs = self.config.per_device_batch_size * self.mesh.shape["dp"]
        it = batch_iterator(
            self.eval_dataset, self.collator, global_bs,
            seed=0, epochs=1, drop_last=False,
        )
        for i, batch in enumerate(it):
            if i >= self.config.eval_batches:
                break
            batch = self._put_batch(batch, global_bs)
            metrics = self._eval_step(self.model.params, batch)
            losses.append(float(metrics["ce_loss"]))
            aux.append(float(metrics["aux_loss"]))
        if not losses:
            return {}
        return {
            "eval_loss": float(np.mean(losses)),
            "eval_aux_loss": float(np.mean(aux)),
        }

    def _put_batch(self, batch: dict, target_rows: Optional[int] = None) -> dict:
        """Shard a host batch over dp, padding the leading axis to
        ``target_rows`` (the FIXED global batch size — a collator-filtered
        row must not change the jitted step's batch dimension, which would
        cost a multi-minute recompile per distinct deficit) by duplicating
        real rows (duplicates get labels=-100, so they are compute ballast,
        never gradient signal).  Without ``target_rows``, pads to a dp
        multiple only."""
        dp = self.mesh.shape["dp"]
        n = batch["input_ids"].shape[0]
        target = target_rows if target_rows is not None else -(-n // dp) * dp
        if target != n:
            # jnp indexing: the mel features are already device arrays
            # (collator keeps them on device) — np.asarray here would pull
            # them back through the host
            idx = jnp.asarray(
                np.concatenate([np.arange(n), np.arange(target - n) % n])
            )
            batch = {k: jnp.asarray(v)[idx] for k, v in batch.items()}
            batch["labels"] = batch["labels"].at[n:].set(-100)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self._batch_sharding), batch
        )

    # ------------------------------------------------------------------ train

    def train(self) -> dict:
        cfg = self.config
        start_step = self._maybe_resume()
        rng = jax.random.PRNGKey(cfg.seed)
        global_bs = cfg.per_device_batch_size * self.mesh.shape["dp"]

        it = _Prefetcher(
            batch_iterator(
                self.train_dataset, self.collator, global_bs,
                seed=cfg.seed, transform=self.transform,
                group_by_length=cfg.group_by_length,
                transform_workers=cfg.dataloader_workers,
            ),
            depth=cfg.prefetch_depth,
        )

        best_eval = float("inf")
        patience_left = cfg.early_stopping_patience
        step = start_step  # OPTIMIZER updates (HF max_steps semantics)
        accum = max(cfg.gradient_accumulation_steps, 1)
        micro = start_step * accum
        window_losses: list[float] = []
        nonfinite_streak = 0
        t_window = time.time()
        prev_loss = None  # device array of the PREVIOUS micro-step

        def check_loss(loss_arr) -> None:
            # apply_if_finite only SKIPS bad updates; a sustained NaN run
            # means the data/LR is systemically broken — abort before the
            # guard's error budget runs out and a NaN update is applied.
            nonlocal nonfinite_streak
            loss_f = float(loss_arr)
            nonfinite_streak = 0 if np.isfinite(loss_f) else nonfinite_streak + 1
            if nonfinite_streak >= 25:
                raise FloatingPointError(
                    f"loss non-finite for {nonfinite_streak} consecutive "
                    f"micro-batches around step {step} — aborting before "
                    "optimizer-state poisoning"
                )
            window_losses.append(loss_f)

        try:
            with self.mesh:
                for batch in it:
                    if step >= cfg.max_steps:
                        break
                    batch = self._put_batch(batch, global_bs)
                    if self._accum > 1:
                        is_update = (micro + 1) % self._accum == 0
                        fn = self._update_step if is_update else self._accumulate_step
                        (
                            self.model.params, self.opt_state, self.grad_accum,
                            loss, metrics, rng,
                        ) = fn(
                            self.model.params, self.opt_state, self.grad_accum,
                            batch, rng,
                        )
                    else:
                        self.model.params, self.opt_state, loss, metrics, rng = (
                            self._train_step(
                                self.model.params, self.opt_state, batch, rng
                            )
                        )
                    micro += 1
                    # Watchdog reads the PREVIOUS step's loss: float(loss) on the
                    # step just dispatched would block until the device finishes,
                    # serializing host-side batch placement against compute.  The
                    # one-step lag keeps dispatch async at full depth; the NaN
                    # abort fires one micro-step later, well inside
                    # apply_if_finite's 100-error budget.
                    if prev_loss is not None:
                        check_loss(prev_loss)
                    prev_loss = loss
                    if micro % accum != 0:
                        continue  # mid-accumulation: no optimizer update happened
                    step += 1

                    if step % cfg.logging_steps == 0:
                        dt = time.time() - t_window
                        if not window_losses:
                            # logging_steps*accum == 1: the lagged watchdog
                            # has not sampled yet — sync on the current loss
                            # rather than log mean-of-empty (nan) at step 1
                            check_loss(loss)
                            prev_loss = None
                        self._log(
                            {
                                "step": step,
                                "loss": float(np.mean(window_losses)),
                                "ce_loss": float(metrics["ce_loss"]),
                                "aux_loss": float(metrics["aux_loss"]),
                                "grad_norm": float(metrics["grad_norm"]),
                                "steps_per_s": (max(len(window_losses), 1)
                                                / accum)
                                / max(dt, 1e-9),
                            }
                        )
                        window_losses, t_window = [], time.time()

                    if cfg.eval_steps and step % cfg.eval_steps == 0:
                        eval_metrics = self.evaluate()
                        if eval_metrics:
                            self._log({"step": step, **eval_metrics})
                            if cfg.early_stopping_patience:
                                if eval_metrics["eval_loss"] < best_eval - 1e-5:
                                    best_eval = eval_metrics["eval_loss"]
                                    patience_left = cfg.early_stopping_patience
                                else:
                                    patience_left -= 1
                                    if patience_left <= 0:
                                        print("[trainer] early stopping")
                                        break

                    if cfg.save_steps and step % cfg.save_steps == 0:
                        self._save_checkpoint(step)

            if prev_loss is not None:  # the lagged watchdog's final sample
                check_loss(prev_loss)
        finally:
            # stop the prefetch thread + transform pool, free queued batches
            # (also on the NaN-abort and any other exception path)
            it.close()
        if self._last_saved_step != step:
            # orbax raises StepAlreadyExistsError on a re-save — without the
            # guard a run whose max_steps is a save_steps multiple crashed
            # on this line after the loop's own save
            self._save_checkpoint(step)
        final = {"final_step": step}
        eval_metrics = self.evaluate()
        if eval_metrics:
            final.update(eval_metrics)
        return final
