"""Jitted train steps: single-device and shard_map data-parallel.

TPU-native replacement for the reference's DDP ``Trainer._run_batch``
(multigpu.py:307-338): the loss/grad/update is one compiled function;
data parallelism is a ``shard_map`` over a 1-D mesh with gradient ``pmean``
(the NCCL all-reduce of multigpu.py:319 becomes an ICI collective).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import visc_feature
from ..physics.viscosity import fk_viscosity
from .losses import LossBreakdown, fluidnet_loss, unet_loss


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    net: str = "newfluidnet"          # "fluidnet"-family | "unet" | "convae"
    p_pred: bool = False
    loss_scale: bool = True
    loss_derivative: bool = False
    loss_type: str = "curl"
    roll_forward: int = 1
    # rematerialize the forward pass in the backward pass (trade FLOPs for
    # HBM) — lets large grids / deep roll_forward unrolls fit on chip.
    remat: bool = False
    # training-time dropout (the reference trains with nn.Dropout active,
    # pytorch_networks_convae.py:795-799, -d_r flag). When > 0 the train
    # step takes an extra per-step PRNG key and runs the model with
    # deterministic=False; eval stays deterministic.
    drop_rate: float = 0.0


def _bind_apply(apply_fn, cfg: TrainStepConfig):
    """(params, x, rng) wrapper: threads the dropout rng into Flax apply
    when training-time dropout is enabled; ignores it otherwise."""
    if cfg.drop_rate > 0.0:
        def bound(params, x, rng):
            return apply_fn(params, x, deterministic=False,
                            rngs={"dropout": rng})
    else:
        def bound(params, x, rng):
            del rng
            return apply_fn(params, x)
    return bound


def _fluidnet_loss_fn(apply_fn, cfg: TrainStepConfig):
    def loss_fn(params, batch, rng=None):
        u, v, p = apply_fn(params, batch["x"], rng)
        br = fluidnet_loss(
            u, v, p, batch["y"], p_pred=cfg.p_pred,
            loss_scale=cfg.loss_scale,
            loss_derivative=cfg.loss_derivative, loss_type=cfg.loss_type)
        return br.total, br
    return loss_fn


def _unet_reassemble(x, T, u, v, paras, yc, roll_forward, p=None):
    """Re-assemble the 10/11-channel U-Net input from predictions, with
    the viscosity recomputed from the (detached) predicted temperature
    (multigpu.py:208-232). x channel order:
    (xc/4, yc/4, dt, raq_nd, fkt_nd, fkp_nd, V, T, u, v[, p...])."""
    T = jax.lax.stop_gradient(T)
    V = fk_viscosity(paras[:, 1][:, None, None], paras[:, 2][:, None, None],
                     1.0 - yc, T)
    Vf = visc_feature(V)
    dt = x[..., 2] / roll_forward
    chans = [x[..., 0], x[..., 1], dt, x[..., 3], x[..., 4], x[..., 5],
             Vf, T, u, v]
    if p is not None and x.shape[-1] > 10:
        chans.append(jax.lax.stop_gradient(p))
    elif x.shape[-1] > 10:
        chans.append(x[..., 10])
    return jnp.stack(chans, axis=-1)


def _unet_loss_fn(apply_fn, cfg: TrainStepConfig):
    def loss_fn(params, batch, rng=None):
        x = batch["x"]
        paras = batch["paras"]
        yc = batch["yc"]
        # roll_forward autoregressive unroll: (roll_forward - 1) stop-grad
        # warm steps, one graded step (multigpu.py:207-251).
        T = x[..., 7]
        u = x[..., 8]
        v = x[..., 9]
        p = None
        for r in range(cfg.roll_forward):
            ri = None if rng is None else jax.random.fold_in(rng, r)
            xi = _unet_reassemble(x, T, u, v, paras, yc, cfg.roll_forward,
                                  p=p)
            if r < cfg.roll_forward - 1:
                u, v, p, T = jax.lax.stop_gradient(
                    apply_fn(params, xi, ri))
            else:
                u, v, p, T = apply_fn(params, xi, ri)
        br = unet_loss(
            u, v, p, T, batch["y"], p_pred=cfg.p_pred,
            loss_scale=cfg.loss_scale,
            loss_derivative=cfg.loss_derivative, loss_type=cfg.loss_type)
        return br.total, br
    return loss_fn


def _transolver_loss_fn(apply_fn, cfg: TrainStepConfig):
    """Transolver outputs live on the (H-2, W-2) VALID interior
    (Transolver_Structured_Mesh_2D-checkpoint.py:201-204) — the target is
    cropped accordingly."""
    def loss_fn(params, batch, rng=None):
        u, v, p = apply_fn(params, batch["x"], rng)
        y = batch["y"][..., 1:-1, 1:-1]
        br = fluidnet_loss(
            u, v, p, y, p_pred=cfg.p_pred, loss_scale=cfg.loss_scale,
            loss_derivative=cfg.loss_derivative, loss_type=cfg.loss_type)
        return br.total, br
    return loss_fn


def _convae_loss_fn(apply_fn, cfg: TrainStepConfig):
    """ConvAE reconstruction loss (the reference's lost ``get_loss_convae``
    path, multigpu.py:311-314 — documented reconstruction): L1 on the
    reconstructed (u, v) channels + the mass penalty."""
    def loss_fn(params, batch, rng=None):
        out = apply_fn(params, batch["x"], rng)
        # ConvAE curl output channel order: (passthrough..., u, v[, p])
        if cfg.p_pred:
            u, v = out[..., -3], out[..., -2]
        else:
            u, v = out[..., -2], out[..., -1]
        y = batch["y"][..., 1:-1, 1:-1] if u.shape[-1] != batch[
            "y"].shape[-1] else batch["y"]
        br = fluidnet_loss(
            u, v, None, y, p_pred=False, loss_scale=cfg.loss_scale,
            loss_derivative=cfg.loss_derivative, loss_type=cfg.loss_type)
        return br.total, br
    return loss_fn


def make_loss_fn(apply_fn: Callable, cfg: TrainStepConfig):
    apply_fn = _bind_apply(apply_fn, cfg)
    if cfg.remat:
        apply_fn = jax.checkpoint(apply_fn)
    if cfg.net in ("unet", "iunet"):
        return _unet_loss_fn(apply_fn, cfg)
    if "transolver" in cfg.net:
        return _transolver_loss_fn(apply_fn, cfg)
    if cfg.net == "vit":
        return _fluidnet_loss_fn(apply_fn, cfg)
    if cfg.net == "convae":
        return _convae_loss_fn(apply_fn, cfg)
    return _fluidnet_loss_fn(apply_fn, cfg)


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    cfg: TrainStepConfig,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    donate: bool = False,
):
    """Build ``train_step(params, opt_state, batch) -> (params, opt_state,
    LossBreakdown)``. With ``mesh``, the step is a shard_map over the batch
    axis with gradient pmean (DP over ICI).

    With ``cfg.drop_rate > 0`` the step takes a fourth argument — a
    per-step PRNG key — and runs the model in training mode (dropout
    active, pytorch_networks_convae.py:795-799). Under the mesh the key is
    folded with the device index so each shard draws an independent mask.

    ``donate=True`` donates the params/opt_state buffers to XLA (the
    caller must rebind them to the returned values — the epoch-loop
    pattern). Opt-in because a donated input is dead after the call;
    library callers that hold onto ``params`` across steps (eval on the
    same pytree, update-equivalence tests) must leave it off. On CPU
    donation is ignored by XLA, so tests are unaffected either way.
    """

    loss_fn = make_loss_fn(apply_fn, cfg)
    use_dropout = cfg.drop_rate > 0.0

    def _step(params, opt_state, batch, rng=None):
        if use_dropout and mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (_, br), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, axis_name)
            br = jax.lax.pmean(br, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, br

    dn = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(_step, donate_argnums=dn)

    rep = P()
    batch_spec = P(axis_name)
    if use_dropout:
        step = shard_map(
            _step, mesh=mesh,
            in_specs=(rep, rep, batch_spec, rep),
            out_specs=(rep, rep, rep),
        )
    else:
        step = shard_map(
            lambda p, o, b: _step(p, o, b), mesh=mesh,
            in_specs=(rep, rep, batch_spec),
            out_specs=(rep, rep, rep),
        )
    return jax.jit(step, donate_argnums=dn)


def make_eval_step(apply_fn: Callable, cfg: TrainStepConfig,
                   mesh: Optional[Mesh] = None, axis_name: str = "data"):
    """CV-loss step (no grad) — the reference's no_grad cv loop
    (multigpu.py:383-410). Always deterministic: dropout is disabled at
    eval like the reference's ``model.eval()``."""
    loss_fn = make_loss_fn(apply_fn,
                           dataclasses.replace(cfg, drop_rate=0.0))

    def _step(params, batch) -> LossBreakdown:
        _, br = loss_fn(params, batch)
        if mesh is not None:
            br = jax.lax.pmean(br, axis_name)
        return br

    if mesh is None:
        return jax.jit(_step)
    step = shard_map(
        _step, mesh=mesh, in_specs=(P(), P(axis_name)), out_specs=P())
    return jax.jit(step)
