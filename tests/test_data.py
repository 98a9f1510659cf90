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


# ---------------------------------------------------------------------------
# host-resident (HBM-scale) mode
# ---------------------------------------------------------------------------


def _batches_equal(b1, b2):
    assert set(b1) == set(b2)
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]),
                                      np.asarray(b2[k]), err_msg=k)


def test_host_resident_snapshot_batches_bitwise_match_device():
    """The host-resident gather→device_put→assemble path must produce
    BITWISE the same batches as the device-resident gather for the same
    indices/keys (both run the shared _assemble_gathered)."""
    store = synthetic_store(n_snapshots=10, with_p=True)
    dev = SnapshotDataset(store, p_pred=True, noise=1e-5,
                          host_resident=False)
    host = SnapshotDataset(store, p_pred=True, noise=1e-5,
                           host_resident=True)
    assert not dev.host_resident and host.host_resident
    for b1, b2 in zip(dev.epoch_batches(np.random.default_rng(3), 4),
                      host.epoch_batches(np.random.default_rng(3), 4)):
        _batches_equal(b1, b2)


def test_host_resident_timepair_batches_bitwise_match_device():
    store = synthetic_store(n_snapshots=12)
    dev = TimePairDataset(store, roll_forward=2, host_resident=False)
    host = TimePairDataset(store, roll_forward=2, host_resident=True)
    for b1, b2 in zip(dev.epoch_batches(np.random.default_rng(5), 3),
                      host.epoch_batches(np.random.default_rng(5), 3)):
        _batches_equal(b1, b2)


def test_residency_auto_threshold(monkeypatch):
    """host_resident=None decides by store size vs
    PMC_DEVICE_STORE_BYTES (default 4 GiB)."""
    store = synthetic_store(n_snapshots=8)
    assert not SnapshotDataset(store).host_resident      # tiny store
    monkeypatch.setenv("PMC_DEVICE_STORE_BYTES",
                       str(store.field_nbytes(4) - 1))
    assert SnapshotDataset(store).host_resident
    assert TimePairDataset(store).host_resident


def test_memmap_store_roundtrip_and_training_path(tmp_path):
    """synthetic_store_memmap writes slice-wise, reopens without
    regeneration, and feeds the host-resident dataset end to end."""
    from pbml_mantle_convection_tpu.data import synthetic_store_memmap

    path = str(tmp_path / "store")
    store = synthetic_store_memmap(
        path, grid=Grid(H=16, W=32),
        params_list=(SimParams(2.0, 1e7, 3.0), SimParams(4.0, 1e8, 10.0)),
        n_snapshots_per_sim=25, chunk=7)
    assert isinstance(store.T, np.memmap)
    assert len(store) == 50
    # reopen is cheap and identical
    store2 = synthetic_store_memmap(
        path, grid=Grid(H=16, W=32),
        params_list=(SimParams(2.0, 1e7, 3.0), SimParams(4.0, 1e8, 10.0)),
        n_snapshots_per_sim=25)
    np.testing.assert_array_equal(np.asarray(store.T[3]),
                                  np.asarray(store2.T[3]))
    # BCs and physical ranges survive the slice-wise generation
    assert np.allclose(store.T[:, 0, :], 1.0)
    assert np.allclose(store.T[:, -1, :], 0.0)

    ds = SnapshotDataset(store, host_resident=True)
    batches = list(ds.epoch_batches(np.random.default_rng(0), 8))
    assert len(batches) == 6
    assert batches[0]["x"].shape == (8, 16, 32, 7)
    assert all(np.isfinite(np.asarray(b["x"])).all() for b in batches)


def test_prefetch_iter_order_and_depth_zero():
    from pbml_mantle_convection_tpu.data import prefetch_iter

    assert list(prefetch_iter(lambda i: i * i, 7, depth=2)) == [
        i * i for i in range(7)]
    assert list(prefetch_iter(lambda i: i, 3, depth=0)) == [0, 1, 2]
    assert list(prefetch_iter(lambda i: i, 0)) == []
    # worker actually runs ahead: thread identity differs from consumer
    import threading
    main = threading.get_ident()
    tids = list(prefetch_iter(lambda i: threading.get_ident(), 4))
    assert all(t != main for t in tids)
