"""Loss + train-step tests, incl. the 8-device DP mesh on CPU."""

import numpy as np
import pytest
import optax
import torch
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models import NewFluidNet, Unet
from pbml_mantle_convection_tpu.parallel.mesh import make_mesh, shard_batch
from pbml_mantle_convection_tpu.train.losses import (
    fluidnet_loss, mass_penalty, mass_residual, scaled_boundary_l1)
from pbml_mantle_convection_tpu.train.train_step import (
    TrainStepConfig, make_eval_step, make_train_step)


def test_scaled_boundary_l1_matches_torch():
    """Oracle of Trainer.loss_fn (multigpu.py:122-134)."""
    rng = np.random.default_rng(0)
    xt = rng.normal(size=(3, 12, 14))
    xp = rng.normal(size=(3, 12, 14))

    t_true = torch.tensor(xt, dtype=torch.float64)
    t_pred = torch.tensor(xp, dtype=torch.float64)
    maxs = torch.amax(t_true, dim=(1, 2), keepdim=True)
    mins = torch.amin(t_true, dim=(1, 2), keepdim=True)
    scaler = torch.clip(1.0 / (maxs - mins), 1.0, 10.0)
    bc = torch.ones_like(t_true) + 10.0
    bc[:, 2:-2, 2:-2] = 1.0
    ref = torch.mean(torch.abs((t_true - t_pred) * scaler * bc)).item()
    ref_plain = torch.nn.L1Loss()(t_true, t_pred).item()

    loss, plain = scaled_boundary_l1(jnp.asarray(xt), jnp.asarray(xp))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-13)
    np.testing.assert_allclose(float(plain), ref_plain, rtol=1e-13)


def test_mass_penalty_modes():
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(2, 10, 12)))
    v = jnp.asarray(rng.normal(size=(2, 10, 12)))
    m = mass_residual(u, v)
    assert m.shape == (2, 8, 10)
    assert float(mass_penalty(m, "mass")) > 0
    assert float(mass_penalty(m, "curl")) > 0
    assert float(mass_penalty(m, "mae")) == 0.0


def test_fluidnet_loss_breakdown():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(2, 10, 12)))
    v = jnp.asarray(rng.normal(size=(2, 10, 12)))
    y = jnp.asarray(rng.normal(size=(2, 2, 10, 12)))
    br = fluidnet_loss(u, v, None, y, loss_derivative=True,
                       loss_type="curl")
    assert all(np.isfinite(float(x)) for x in br)
    # perfect prediction → u/v losses vanish but mass penalty stays
    br0 = fluidnet_loss(y[:, 0], y[:, 1], None, y, loss_type="mae")
    assert float(br0.u) == 0.0 and float(br0.v) == 0.0


def _tiny_batch(rng, b, H=16, W=24, unet=False):
    if unet:
        x = jnp.asarray(rng.normal(size=(b, H, W, 10)))
        y = jnp.asarray(rng.normal(size=(b, 3, H, W)))
        paras = jnp.asarray(
            np.tile([2.0, 1e7, 3.0], (b, 1)))
        yc = jnp.asarray(np.linspace(0, 1, H))[None, :, None] * jnp.ones(
            (b, H, W))
        return {"x": x, "y": y, "paras": paras, "yc": yc}
    x = jnp.asarray(rng.normal(size=(b, H, W, 7)))
    y = jnp.asarray(rng.normal(size=(b, 2, H, W)))
    return {"x": x, "y": y}


def test_train_step_single_device_descends():
    rng = np.random.default_rng(3)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False)
    batch = _tiny_batch(rng, 4)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    cfg = TrainStepConfig(net="newfluidnet", loss_type="curl")
    step = make_train_step(model.apply, opt, cfg)
    losses = []
    for _ in range(10):
        params, opt_state, br = step(params, opt_state, batch)
        losses.append(float(br.total))
    assert losses[-1] < losses[0]


def test_train_step_dp_mesh_matches_single_device():
    """DP over the 8-device CPU mesh must produce the same update as
    single-device training on the full batch (grad pmean == full-batch
    mean since shards are equal-sized)."""
    rng = np.random.default_rng(4)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False)
    batch = _tiny_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="newfluidnet", loss_type="curl",
                          loss_scale=False)

    step1 = make_train_step(model.apply, opt, cfg)
    p1, _, br1 = step1(params, opt.init(params), batch)

    mesh = make_mesh(8)
    stepN = make_train_step(model.apply, opt, cfg, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    pN, _, brN = stepN(params, opt.init(params), sharded)

    np.testing.assert_allclose(float(br1.total), float(brN.total),
                               rtol=1e-10)
    # per-shard mean + pmean reassociates float sums; adam's rsqrt
    # amplifies the ~1e-16 difference to ~1e-9 on the updated params
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_unet_roll_forward_train_step():
    rng = np.random.default_rng(5)
    model = Unet(levels=2, c_i=10, c_h=8, c_o=2, loss_type="curl",
                 repeats=1, f=5, p_pred=False)
    batch = _tiny_batch(rng, 2, unet=True)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="unet", loss_type="curl", roll_forward=3)
    step = make_train_step(model.apply, opt, cfg)
    params, _, br = step(params, opt.init(params), batch)
    assert np.isfinite(float(br.total))
    assert float(br.T) > 0


def test_eval_step():
    rng = np.random.default_rng(6)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False)
    batch = _tiny_batch(rng, 2)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    cfg = TrainStepConfig(net="newfluidnet")
    ev = make_eval_step(model.apply, cfg)
    br = ev(params, batch)
    assert np.isfinite(float(br.total))


@pytest.mark.slow
def test_transolver_train_step():
    from pbml_mantle_convection_tpu.data import (
        UnstructuredDataset, synthetic_store)
    from pbml_mantle_convection_tpu.models import TransolverStructured2D

    store = synthetic_store(n_snapshots=4)
    ds = UnstructuredDataset(store, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    batch = ds.batch(rng, 2)
    H, W = store.T.shape[1:]
    model = TransolverStructured2D(H=H, W=W, fun_dim=5, n_layers=1,
                                   n_hidden=8, n_head=2, slice_num=4,
                                   p_pred=False)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="transolver_structured", loss_type="curl")
    step = make_train_step(model.apply, opt, cfg)
    params, _, br = step(params, opt.init(params), batch)
    assert np.isfinite(float(br.total))


@pytest.mark.slow
def test_convae_train_step():
    from pbml_mantle_convection_tpu.data import (
        ConvAEDataset, synthetic_store)
    from pbml_mantle_convection_tpu.models import ConvAE

    store = synthetic_store(n_snapshots=4, grid=None)
    ds = ConvAEDataset(store, dtype=jnp.float64)
    rng = np.random.default_rng(8)
    batch = ds.batch(rng, 2)
    assert batch["x"].shape[-1] == 3
    model = ConvAE(levels=1, c_i=3, c_h=4, c_o=3, loss_type="curl",
                   repeats=1, p_pred=False)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="convae", loss_type="curl")
    step = make_train_step(model.apply, opt, cfg)
    params, _, br = step(params, opt.init(params), batch)
    assert np.isfinite(float(br.total))


@pytest.mark.slow
def test_remat_train_step_matches():
    """remat=True must give identical updates (FLOPs-for-memory only)."""
    rng = np.random.default_rng(9)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False)
    batch = _tiny_batch(rng, 2)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    p1, _, b1 = make_train_step(model.apply, opt, TrainStepConfig())(
        params, opt.init(params), batch)
    p2, _, b2 = make_train_step(model.apply, opt,
                                TrainStepConfig(remat=True))(
        params, opt.init(params), batch)
    np.testing.assert_allclose(float(b1.total), float(b2.total), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


@pytest.mark.slow
def test_unet_p_pred_eleven_channels():
    """p_pred U-Net: the 11th (p_prev) channel flows end to end — the
    reference declares c_i=11 but never assembles it (datasetio.py:258-274)."""
    from pbml_mantle_convection_tpu.data import (
        TimePairDataset, synthetic_store)

    store = synthetic_store(n_snapshots=8, with_p=True)
    ds = TimePairDataset(store, roll_forward=1, p_pred=True)
    rng = np.random.default_rng(10)
    batch = ds.batch(rng, 2)
    assert batch["x"].shape[-1] == 11
    assert batch["y"].shape[1] == 4  # u, v, p, T

    model = Unet(levels=2, c_i=11, c_h=8, c_o=3, loss_type="curl",
                 repeats=1, f=5, p_pred=True)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="unet", loss_type="curl", p_pred=True,
                          roll_forward=2)
    step = make_train_step(model.apply, opt, cfg)
    params, _, br = step(params, opt.init(params), batch)
    assert np.isfinite(float(br.total))


def test_dropout_active_in_training_only():
    """drop_rate > 0: training is stochastic per step (the reference trains
    with nn.Dropout active, pytorch_networks_convae.py:795-799, -d_r flag);
    eval stays deterministic."""
    rng = np.random.default_rng(12)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False, drop_rate=0.5)
    batch = _tiny_batch(rng, 4)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="newfluidnet", loss_type="curl",
                          drop_rate=0.5)
    step = make_train_step(model.apply, opt, cfg)

    k1, k2 = jax.random.PRNGKey(100), jax.random.PRNGKey(200)
    _, _, br_a = step(params, opt.init(params), batch, k1)
    _, _, br_b = step(params, opt.init(params), batch, k2)
    _, _, br_a2 = step(params, opt.init(params), batch, k1)
    assert float(br_a.total) != float(br_b.total)  # different masks
    np.testing.assert_allclose(float(br_a.total), float(br_a2.total),
                               rtol=1e-12)         # same key → same mask

    # eval is deterministic even when cfg carries a drop_rate, and it
    # differs from the dropout-active training loss on identical inputs
    ev = make_eval_step(model.apply, cfg)
    e1, e2 = float(ev(params, batch).total), float(ev(params, batch).total)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)
    assert float(br_a.total) != e1


@pytest.mark.slow
def test_dropout_dp_mesh():
    """The dropout rng threads through the shard_map DP step with a
    per-device fold-in."""
    rng = np.random.default_rng(13)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False, drop_rate=0.3)
    batch = _tiny_batch(rng, 8)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="newfluidnet", loss_type="curl",
                          loss_scale=False, drop_rate=0.3)
    mesh = make_mesh(8)
    stepN = make_train_step(model.apply, opt, cfg, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    pN, _, brN = stepN(params, opt.init(params), sharded,
                       jax.random.PRNGKey(7))
    assert np.isfinite(float(brN.total))


@pytest.mark.slow
def test_vit_field_train_step():
    from pbml_mantle_convection_tpu.data import (
        SnapshotDataset, synthetic_store)
    from pbml_mantle_convection_tpu.models import ModelConfig, build_model

    store = synthetic_store(n_snapshots=4)
    ds = SnapshotDataset(store, dtype=jnp.float64)
    rng = np.random.default_rng(11)
    batch = ds.batch(rng, 2)
    H, W = store.T.shape[1:]
    cfg_m = ModelConfig(network="vit", H=H, W=W, n_hidden=16, n_head=2,
                        n_layers=1, loss_type="mae", p_pred=False)
    model = build_model(cfg_m)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="vit", loss_type="mae")
    step = make_train_step(model.apply, opt, cfg)
    params, _, br = step(params, opt.init(params), batch)
    assert np.isfinite(float(br.total))


def test_train_step_donate_matches_undonated():
    """donate=True (the epoch-loop calling convention) must produce the
    same training trajectory as the default step. On CPU XLA ignores
    donation, so this pins the argument path + calling convention; the
    TPU-side effect is measured in PERF.md (round 5)."""
    rng = np.random.default_rng(11)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, loss_type="curl",
                        repeats=1, p_pred=False)
    batch = _tiny_batch(rng, 4)
    params = model.init(jax.random.PRNGKey(0), batch["x"])
    opt = optax.adam(1e-3)
    cfg = TrainStepConfig(net="newfluidnet", loss_type="curl")

    p_ref, o_ref = params, opt.init(params)
    step_ref = make_train_step(model.apply, opt, cfg)
    p_don, o_don = params, opt.init(params)
    step_don = make_train_step(model.apply, opt, cfg, donate=True)
    for _ in range(3):
        p_ref, o_ref, br_ref = step_ref(p_ref, o_ref, batch)
        p_don, o_don, br_don = step_don(p_don, o_don, batch)
    np.testing.assert_allclose(float(br_ref.total), float(br_don.total),
                               rtol=1e-12)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_don)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
