"""Dataset tests: assembly semantics, selection rules, init-remap quirk."""

import numpy as np
import jax.numpy as jnp

from pbml_mantle_convection_tpu.constants import (
    SimParams, velocity_scaler, visc_feature)
from pbml_mantle_convection_tpu.data import (
    SnapshotDataset, TimePairDataset, select_snapshot_indices,
    synthetic_store)
from pbml_mantle_convection_tpu.physics.viscosity import fk_viscosity
from pbml_mantle_convection_tpu.sim.grid import Grid


def test_snapshot_dataset_assembly():
    store = synthetic_store(n_snapshots=6)
    ds = SnapshotDataset(store, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    b = ds.batch(rng, 4)
    assert b["x"].shape == (4, 32, 68, 7)
    assert b["y"].shape == (4, 2, 32, 68)
    assert b["t_weight"].shape == (4,)

    # verify channel semantics against a manual assembly of sample 0
    idx = 0
    batch = ds._assemble(jnp.asarray([idx]), jnp.zeros(2, jnp.uint32))
    x = np.asarray(batch["x"][0])
    sp = SimParams(*store.paras[idx])
    np.testing.assert_allclose(x[..., 0], store.xc / 4.0, atol=1e-12)
    np.testing.assert_allclose(x[..., 1], store.yc / 4.0, atol=1e-12)
    V = np.clip(np.asarray(fk_viscosity(sp.fkt, sp.fkp,
                                        1.0 - store.yc, store.T[idx])),
                1e-8, 1.0)
    np.testing.assert_allclose(x[..., 2], np.log10(V) / 8.0, atol=1e-12)
    np.testing.assert_allclose(x[..., 3], sp.raq_nd, atol=1e-12)
    np.testing.assert_allclose(x[..., 6], store.T[idx], atol=1e-12)
    y = np.asarray(batch["y"][0])
    s = velocity_scaler(sp.raq, sp.fkt, sp.fkp)
    np.testing.assert_allclose(y[0], store.u[idx] / s, rtol=1e-12)
    # t_weight = 6/(i+1)^0.25 (datasetio.py:472)
    np.testing.assert_allclose(
        float(batch["t_weight"][0]),
        6.0 / (store.step_index[idx] + 1) ** 0.25, rtol=1e-12)


def test_noise_injection_bounds():
    store = synthetic_store(n_snapshots=4)
    ds = SnapshotDataset(store, noise=1e-5, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    b = ds.batch(rng, 2)
    T = np.asarray(b["x"][..., 6])
    assert T.max() <= 1.35 + 1e-12
    # boundary ring untouched by noise
    np.testing.assert_allclose(T[0, 0], store.T[int(0)][0], atol=2e-5)


def test_select_snapshot_indices_rules():
    rng = np.random.default_rng(0)
    # short run: 1..times-1, init = first 5
    short = select_snapshot_indices(100, rng)
    assert short[0] == 6 and short[-1] == 97
    init = select_snapshot_indices(100, rng, is_init=True)
    assert list(init) == [1, 2, 3, 4, 5]
    # long run: 199 head + ≤500 random tail
    long = select_snapshot_indices(900, rng)
    assert len(long) <= 199 + 500 - 5
    assert (long[:194] == np.arange(6, 200)).all()


def test_time_pair_dataset():
    store = synthetic_store(n_snapshots=12)
    ds = TimePairDataset(store, roll_forward=2)
    assert len(ds) == 12 - 2 - 1
    rng = np.random.default_rng(2)
    b = ds.batch(rng, 4)
    assert b["x"].shape == (4, 32, 68, 10)
    assert b["y"].shape == (4, 3, 32, 68)  # u, v, T
    assert b["paras"].shape == (4, 3)
    # dt channel equals times difference
    i0, i1 = ds.pairs[0]
    batch = ds._assemble(jnp.asarray([i0]), jnp.asarray([i1]))
    np.testing.assert_allclose(
        float(batch["x"][0, 0, 0, 2]),
        store.times[i1] - store.times[i0], rtol=1e-6)


def test_time_pair_init_remap_quirk():
    """Pairs with idx0 % 8 == 0 are remapped to a random init pair
    (datasetio.py:233-236)."""
    store = synthetic_store(n_snapshots=20)
    ds = TimePairDataset(store, roll_forward=1)
    rng = np.random.default_rng(3)
    all_idx = np.arange(len(ds.pairs))
    pairs = ds._remap_init(all_idx, rng)
    mask = ds.pairs[:, 0] % 8 == 0
    assert mask.any()
    # remapped rows must be one of the init pairs
    for row in pairs[mask]:
        assert (row == ds.init_pairs).all(axis=1).any()
    # others untouched
    np.testing.assert_array_equal(pairs[~mask], ds.pairs[all_idx][~mask])


def test_epoch_batches_cover_dataset():
    store = synthetic_store(n_snapshots=10)
    ds = SnapshotDataset(store, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    n = sum(b["x"].shape[0] for b in ds.epoch_batches(rng, 3))
    assert n == (len(ds) // 3) * 3
