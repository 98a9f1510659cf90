"""Trainer: epoch loops, init-batch mixing, LR schedule, loss log, restart.

TPU-native replacement for the reference DDP ``Trainer``
(multigpu.py:37-450) and its surrounding ``load_train_objs``/``main``
plumbing (multigpu.py:453-908):

* the per-batch work is one jitted (optionally shard_map data-parallel)
  train step (train/train_step.py);
* each main batch is mixed with a small batch from the "init" dataset and
  shuffled, mirroring multigpu.py:866-884 + 351-361 (``small_batch`` = 2,
  or 1 when data-parallel);
* MultiStepLR(γ=0.5) is reproduced with an epoch-indexed LR
  (multigpu.py:765-767);
* the append-only ``fluidnet_uvpT.txt`` loss log keeps the exact reference
  format so restart (multigpu.py:621-670) and rollout-time model selection
  (advect_wi_gaia.py:389-416) parse identically;
* checkpoints include optimizer state (utils/checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.registry import ModelConfig, build_model
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.checkpoint import restore_checkpoint, save_checkpoint
from .train_step import TrainStepConfig, make_eval_step, make_train_step

LOG_HEADER = "Epoch, train loss, val loss, learning rate \n"


@dataclasses.dataclass
class TrainConfig:
    """Typed run config replacing the argparse soup (multigpu.py:911-1087)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    epochs: int = 150
    batch_size: int = 16
    save_every: int = 1
    start_lr: float = 1e-3
    gamma: float = 0.5
    milestones: Tuple[int, ...] = (20, 40, 60, 80, 180, 120)
    l2_reg: float = 0.0
    loss_scale: bool = True
    loss_derivative: bool = False
    roll_forward: int = 1
    debug: bool = False
    n_devices: Optional[int] = None  # None = single device
    seed: int = 0
    # backpressure: max train-step dispatches in flight before the epoch
    # loop blocks on the oldest one. Dispatch is async and the per-step
    # losses accumulate on device, so an unthrottled loop enqueues steps
    # as fast as the input pipeline produces them — each in-flight step
    # pins its host batch buffer, and at HBM scale that grew ~12 MB/step
    # until the store's page cache was evicted and the gather started
    # thrashing disk (measured: 6x the store size read per epoch,
    # PERF.md round-5 "end-to-end training epoch").
    max_in_flight: int = 8

    @classmethod
    def schedule_for(cls, network: str,
                     debug: bool) -> Tuple[int, Tuple[int, ...]]:
        """Epoch + milestone derivation, incl. the reference's ifluidnet
        special case (multigpu.py:1059-1070). The single source of truth
        — cli/train.py consumes this."""
        if network == "ifluidnet":
            return ((80, (4, 14, 24, 34, 50)) if debug
                    else (40, (2, 7, 12, 17, 25)))
        if debug:
            return 1500, (20, 200, 400, 600, 800, 1000)
        return 150, (20, 40, 60, 80, 180, 120)

    def lr_at_epoch(self, epoch: int) -> float:
        """MultiStepLR(γ) by epoch (multigpu.py:765-767)."""
        n_passed = sum(1 for m in self.milestones if epoch >= m)
        return self.start_lr * (self.gamma ** n_passed)


def parse_loss_log(path: str) -> List[dict]:
    """Parse the reference-format loss log (multigpu.py:634-658,
    advect_wi_gaia.py:401-416). Returns one dict per epoch line."""
    with open(path) as f:
        lines = f.readlines()
    out = []
    for l in lines[1:]:
        ll = l[l.index("[") + 1: l.index("],[")].split(",")
        l_r = l[l.index("],[") + 3:]
        ll_cv = l_r[: l_r.index("],")].split(",")
        out.append({
            "epoch": int(l.split(",")[0]),
            "train": [float(v) for v in ll],
            "cv": [float(v) for v in ll_cv],
            "lr": float(l.split(",")[-1]),
        })
    return out


def best_epoch_from_log(path: str, column: int = 0) -> int:
    """Rollout-time model selection: the reference appends
    ``len(loss_u) - 1`` per run dir and loads ``last_epochs[-1] - 1``
    (advect_wi_gaia.py:416, 426) — i.e. the SECOND-to-last logged epoch
    when no explicit epoch is given."""
    entries = parse_loss_log(path)
    return max(0, len(entries) - 2)


class Trainer:
    """See module docstring. Drives datasets with a ``.epoch_batches(rng,
    batch_size)`` iterator and optional ``*_init`` datasets for batch
    mixing."""

    def __init__(
        self,
        cfg: TrainConfig,
        train_data,
        cv_data,
        train_data_init=None,
        cv_data_init=None,
        nn_dir: str = "./runs",
        restart: bool = False,
    ):
        self.cfg = cfg
        self.train_data = train_data
        self.cv_data = cv_data
        self.train_data_init = train_data_init
        self.cv_data_init = cv_data_init
        self.nn_dir = os.path.join(nn_dir, cfg.model.run_name)
        os.makedirs(self.nn_dir, exist_ok=True)
        self.log_path = os.path.join(self.nn_dir, "fluidnet_uvpT.txt")

        self.model = build_model(cfg.model)
        self.rng = np.random.default_rng(cfg.seed)

        # small-batch init mixing (multigpu.py:866-868); clamped so the
        # main stream keeps >=1 example per batch at tiny batch sizes
        # (the reference crashes there with a 0-size DataLoader)
        self.small_batch = 0
        if train_data_init is not None:
            self.small_batch = min(1 if (cfg.n_devices or 1) > 1 else 2,
                                   max(0, cfg.batch_size - 1))

        self.mesh = make_mesh(cfg.n_devices) if cfg.n_devices else None

        # optimizer: Adam + weight decay (multigpu.py:761-763); LR injected
        # per epoch to reproduce MultiStepLR.
        self.optimizer = optax.inject_hyperparams(
            _adam_l2, static_args=("l2_reg",))(
            learning_rate=cfg.start_lr, l2_reg=cfg.l2_reg)

        step_cfg = TrainStepConfig(
            net=cfg.model.network, p_pred=cfg.model.p_pred,
            loss_scale=cfg.loss_scale, loss_derivative=cfg.loss_derivative,
            loss_type=cfg.model.loss_type, roll_forward=cfg.roll_forward,
            drop_rate=getattr(cfg.model, "drop_rate", 0.0))
        # per-step dropout keys (reference trains with nn.Dropout active,
        # multigpu.py -d_r; models in .train() mode)
        self._use_dropout = step_cfg.drop_rate > 0.0
        self._dropout_base_key = jax.random.PRNGKey(cfg.seed + 1)
        self._global_step = 0
        self._train_step = make_train_step(
            self.model.apply, self.optimizer, step_cfg, mesh=self.mesh)
        self._eval_step = make_eval_step(self.model.apply, step_cfg,
                                         mesh=self.mesh)

        self.start_epoch = 0
        self.params = None
        self.opt_state = None
        if restart:
            self._restart()

    # ------------------------------------------------------------------

    def _init_params(self, example_batch):
        key = jax.random.PRNGKey(self.cfg.seed)
        self.params = self.model.init(key, example_batch["x"])
        self.opt_state = self.optimizer.init(self.params)

    def _restart(self):
        """Re-derive epoch from the loss log and reload the checkpoint
        (multigpu.py:621-670)."""
        from flax import serialization

        entries = parse_loss_log(self.log_path)
        if not entries:
            return
        epoch = entries[-1]["epoch"]
        ckpt = os.path.join(self.nn_dir, f"{epoch}_fluidnet_uvp.ckpt")
        raw = restore_checkpoint(ckpt)
        self.params = raw["params"]
        # Unlike the reference (which drops optimizer state,
        # multigpu.py:412-436), restore it when structurally compatible.
        self.opt_state = self.optimizer.init(self.params)
        try:
            self.opt_state = serialization.from_state_dict(
                self.opt_state, raw["opt_state"])
        except (KeyError, ValueError):
            pass
        self.start_epoch = epoch + 1
        print(f"Restarting from epoch {self.start_epoch}, "
              f"lr {self.cfg.lr_at_epoch(self.start_epoch)}")

    def _maybe_shard(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def _mix_init(self, batch, init_source):
        """Concatenate a small init batch and shuffle
        (multigpu.py:351-361). The init stream cycles — the reference
        re-creates its loader iterator every batch (multigpu.py:354) and
        never exhausts it; a shrinking batch would also break shard_map
        divisibility and force recompiles."""
        if init_source is None:
            return batch
        dataset, it = init_source
        try:
            init_batch = next(it[0])
        except StopIteration:
            it[0] = dataset.epoch_batches(self.rng, self.small_batch)
            init_batch = next(it[0])
        keys = set(batch) & set(init_batch)
        merged = {k: jnp.concatenate((batch[k], init_batch[k]), axis=0)
                  for k in keys}
        perm = self.rng.permutation(merged["x"].shape[0])
        return {k: v[perm] for k, v in merged.items()}

    def _set_lr(self, epoch: int):
        lr = self.cfg.lr_at_epoch(epoch)
        # inject_hyperparams exposes .hyperparams on the optimizer state
        cur = self.opt_state.hyperparams["learning_rate"]
        self.opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(
            lr, getattr(cur, "dtype", jax.numpy.float32))
        return lr

    # ------------------------------------------------------------------

    def run_epoch(self, epoch: int) -> Tuple[List[float], List[float]]:
        """One train + cv epoch; returns the 6-column loss vectors
        (multigpu.py:340-410)."""
        cfg = self.cfg
        bs = cfg.batch_size - self.small_batch

        # per-step losses accumulate ON DEVICE (async dispatch) and are
        # fetched ONCE per epoch: per-step float()/np.asarray of the 6
        # scalars forces a host sync every batch, which both breaks the
        # input-prefetch overlap and — through a remote-device relay —
        # costs more than the train step itself (PERF.md round-5
        # "end-to-end training epoch").
        acc = None
        n = 0
        # bounded in-flight window (cfg.max_in_flight): blocking on the
        # step K dispatches back keeps the device queue deep enough to
        # overlap the input pipeline while releasing each consumed
        # batch's host buffer — without it the loop enqueues without
        # limit and pins every pending batch in host RAM
        from collections import deque
        window = deque()
        init_src = None
        if self.train_data_init is not None:
            init_src = (self.train_data_init,
                        [self.train_data_init.epoch_batches(
                            self.rng, self.small_batch)])
        for batch in self.train_data.epoch_batches(self.rng, bs):
            batch = self._mix_init(batch, init_src)
            if self.params is None:
                self._init_params(batch)
                self._set_lr(epoch)
            batch = self._maybe_shard(batch)
            if self._use_dropout:
                rng = jax.random.fold_in(self._dropout_base_key,
                                         self._global_step)
                self.params, self.opt_state, br = self._train_step(
                    self.params, self.opt_state, batch, rng)
            else:
                self.params, self.opt_state, br = self._train_step(
                    self.params, self.opt_state, batch)
            self._global_step += 1
            br_vec = jnp.stack(list(br))
            acc = br_vec if acc is None else acc + br_vec
            n += 1
            window.append(acc)
            if len(window) > self.cfg.max_in_flight:
                jax.block_until_ready(window.popleft())
        losses = ([float(x) for x in
                   np.asarray(jax.device_get(acc)) / n]
                  if n else [0.0] * 6)

        acc_cv = None
        n_cv = 0
        init_src = None
        if self.cv_data_init is not None:
            init_src = (self.cv_data_init,
                        [self.cv_data_init.epoch_batches(
                            self.rng, self.small_batch)])
        window.clear()
        for batch in self.cv_data.epoch_batches(self.rng, bs):
            batch = self._mix_init(batch, init_src)
            batch = self._maybe_shard(batch)
            br = self._eval_step(self.params, batch)
            br_vec = jnp.stack(list(br))
            acc_cv = br_vec if acc_cv is None else acc_cv + br_vec
            n_cv += 1
            window.append(acc_cv)
            if len(window) > self.cfg.max_in_flight:
                jax.block_until_ready(window.popleft())
        losses_cv = ([float(x) for x in
                      np.asarray(jax.device_get(acc_cv)) / n_cv]
                     if n_cv else [0.0] * 6)
        return losses, losses_cv

    def save(self, epoch: int, losses, losses_cv):
        """Checkpoint + append the reference-format log line
        (multigpu.py:412-436)."""
        ckpt = os.path.join(self.nn_dir, f"{epoch}_fluidnet_uvp.ckpt")
        save_checkpoint(ckpt, {"params": self.params,
                               "opt_state": self.opt_state,
                               "epoch": epoch})
        if not os.path.exists(self.log_path):
            with open(self.log_path, "w") as f:
                f.write(LOG_HEADER)
        with open(self.log_path, "a") as f:
            f.write(f"{epoch},{losses[1:]},{losses_cv[1:]},"
                    f"{self.cfg.lr_at_epoch(epoch)}\n")

    def train(self, epochs: Optional[int] = None):
        epochs = epochs or self.cfg.epochs
        metrics_path = os.path.join(self.nn_dir, "epoch_metrics.txt")
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            if self.params is not None:
                self._set_lr(epoch)
            losses, losses_cv = self.run_epoch(epoch)
            if self.params is None:
                raise RuntimeError(
                    "epoch produced no training batches (dataset smaller "
                    "than the batch size?) — nothing was trained")
            self._set_lr(epoch)  # ensure set when params were just created
            wall = time.time() - t0
            # epoch-time metrics live in a sidecar so fluidnet_uvpT.txt
            # stays byte-compatible with the reference's restart/model-
            # selection parsers (multigpu.py:621-670)
            with open(metrics_path, "a") as f:
                f.write(f"{epoch},{wall:.3f}\n")
            if epoch % self.cfg.save_every == 0:
                self.save(epoch, losses, losses_cv)
                print(f"epoch {epoch}: train {losses[0]:.5f} "
                      f"cv {losses_cv[0]:.5f} "
                      f"({wall:.1f}s)")
        return self.params


def _adam_l2(learning_rate, l2_reg=0.0):
    """Adam with torch-style L2 ('weight_decay' added to the gradient,
    multigpu.py:761-763)."""
    if l2_reg > 0.0:
        return optax.chain(optax.add_decayed_weights(l2_reg),
                           optax.adam(learning_rate))
    return optax.adam(learning_rate)
