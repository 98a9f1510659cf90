"""End-to-end proof of the reference's on-disk ``.pt`` layout path.

Fabricates a reference-shaped snapshot tree on disk with torch
(``{data_dir}/{split}/sim_{id}/e1_{u,v,T}prev_data_select_snaps.pt`` +
init tensors, ``times/xc/yc.pt``, top-level ``sims.pt`` — the layout
NewADDataset reads, datasetio.py:320-558), loads it through
``data/torch_io.load_store``, and asserts

1. **golden batch equality** with the reference's actual
   ``NewADDataset.__getitem__`` channel assembly (datasetio.py:595-654)
   run over the same tree from the mounted /root/reference, and
2. a tiny **training run through Trainer** on the loaded store.

Skipped when torch or the reference mount is unavailable.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

REF = os.environ.get("REFERENCE_DIR", "/root/reference")

torch = pytest.importorskip("torch")

H, W = 24, 52
N_SNAPS = 9   # select_snaps (debug-mode) snapshots per sim
N_INIT = 5


def _fields(rng, n):
    T = np.clip(rng.random((n, 1, H, W)), 0.0, 1.0)
    T[:, :, 0, :], T[:, :, -1, :] = 1.0, 0.0
    u = rng.normal(size=(n, 1, H, W)) * 30.0
    v = rng.normal(size=(n, 1, H, W)) * 30.0
    p = rng.normal(size=(n, 1, H, W))
    return (torch.tensor(T, dtype=torch.float64),
            torch.tensor(u, dtype=torch.float64),
            torch.tensor(v, dtype=torch.float64),
            torch.tensor(p, dtype=torch.float64))


@pytest.fixture(scope="module")
def pt_tree(tmp_path_factory):
    """Reference-shaped .pt tree: 2 train sims + 1 cv sim."""
    root = tmp_path_factory.mktemp("pt_tree")
    rng = np.random.default_rng(7)

    xv = np.linspace(0.0, 4.0, W)
    yv = np.linspace(0.0, 1.0, H)
    xc, yc = np.meshgrid(xv, yv)
    times = np.cumsum(0.01 + 0.001 * rng.random(N_SNAPS + 4))

    sims = [
        [0, "train", 3.217, 8.64e7, 3.016, H, 4, "/fake/sim0"],
        [1, "train", 6.271, 4.94e6, 42.76, H, 4, "/fake/sim1"],
        [2, "cv", 4.215, 2.1e7, 10.12, H, 4, "/fake/sim2"],
    ]
    torch.save(sims, os.path.join(root, "sims.pt"))

    for sid, split, *_ in sims:
        d = os.path.join(root, split, f"sim_{sid}")
        os.makedirs(d)
        T, u, v, p = _fields(rng, N_SNAPS)
        Ti, ui, vi, pi = _fields(rng, N_INIT)
        for name, t in [("uprev", u), ("vprev", v), ("Tprev", T)]:
            torch.save(t, os.path.join(
                d, f"e1_{name}_data_select_snaps.pt"))
        for name, t in [("uprev", ui), ("vprev", vi), ("pprev", pi),
                        ("Tprev", Ti)]:
            torch.save(t, os.path.join(
                d, f"e1_{name}_data_select_init.pt"))
        torch.save(list(range(1, N_INIT + 1)),
                   os.path.join(d, "e1_i_vec_select_init.pt"))
        torch.save(torch.tensor(times, dtype=torch.float64),
                   os.path.join(d, "times.pt"))
        torch.save(torch.tensor(xc, dtype=torch.float64),
                   os.path.join(d, "xc.pt"))
        torch.save(torch.tensor(yc, dtype=torch.float64),
                   os.path.join(d, "yc.pt"))
    return str(root)


def _ref_dataset(pt_tree, **kw):
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import torchvision  # noqa: F401
    except ImportError:
        import types
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        v2 = types.ModuleType("torchvision.transforms.v2")
        v2.GaussianBlur = None
        tr.v2 = v2
        tv.transforms = tr
        sys.modules.setdefault("torchvision", tv)
        sys.modules.setdefault("torchvision.transforms", tr)
        sys.modules.setdefault("torchvision.transforms.v2", v2)
    import datasetio as ref_io
    return ref_io.NewADDataset(pt_tree, **kw)


@pytest.mark.parametrize("an,is_init", [("train", False), ("train", True),
                                        ("cv", False)])
def test_golden_batch_vs_reference(pt_tree, an, is_init):
    """Our load_store + SnapshotDataset assembly == the reference's
    NewADDataset.__getitem__ (x channels, scaled y, t_weight, scaler),
    sample by sample over the whole split."""
    from pbml_mantle_convection_tpu.data import SnapshotDataset
    from pbml_mantle_convection_tpu.data.torch_io import load_store

    store = load_store(pt_tree, an=an, is_init=is_init, debug=True,
                       p_pred=False)
    ours = SnapshotDataset(store, scale=True, noise=0.0,
                           dtype=jnp.float64)
    ref = _ref_dataset(pt_tree, an=an, scale=True, load=False,
                       is_init=is_init, p_pred=False, noise=0.0,
                       debug=True)
    assert len(ours) == len(ref)

    for idx in range(len(ref)):
        x_r, y_r, tw_r, s_r = ref[idx]
        b = ours._assemble(jnp.asarray([idx]), jnp.zeros(2, jnp.uint32))
        x_o = np.asarray(b["x"][0])                  # (H, W, 7)
        np.testing.assert_allclose(
            x_o, np.asarray(x_r).transpose(1, 2, 0), rtol=1e-12,
            atol=1e-14)
        y_o = np.asarray(b["y"][0])                  # (2, H, W)
        np.testing.assert_allclose(y_o, np.asarray(y_r), rtol=1e-12)
        np.testing.assert_allclose(float(b["t_weight"][0]), float(tw_r),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(b["scaler"][0]),
                                   float(np.asarray(s_r).ravel()[0]),
                                   rtol=1e-12)


def test_train_through_trainer_from_pt_tree(pt_tree, tmp_path):
    """A tiny Trainer run end-to-end on the loaded .pt tree: loss log
    written in the reference format, loss decreases."""
    from pbml_mantle_convection_tpu.data import SnapshotDataset
    from pbml_mantle_convection_tpu.data.torch_io import load_store
    from pbml_mantle_convection_tpu.models.registry import ModelConfig
    from pbml_mantle_convection_tpu.train.trainer import (TrainConfig,
                                                          Trainer)

    tr_store = load_store(pt_tree, an="train", debug=True)
    cv_store = load_store(pt_tree, an="cv", debug=True)
    init_store = load_store(pt_tree, an="train", is_init=True)
    assert tr_store.T.shape == (2 * N_SNAPS, H, W)
    assert init_store.T.shape == (2 * N_INIT, H, W)

    dtype = jnp.float32
    train_data = SnapshotDataset(tr_store, scale=True, dtype=dtype)
    cv_data = SnapshotDataset(cv_store, scale=True, dtype=dtype)
    init_data = SnapshotDataset(init_store, scale=True, dtype=dtype)

    mc = ModelConfig(network="newfluidnet", levels=2, c_h=4, repeats=1,
                     kernel=3, r_p="zeros", loss_type="curl",
                     p_pred=False, H=H, W=W, dtype=dtype)
    cfg = TrainConfig(model=mc, epochs=2, batch_size=4, start_lr=1e-3,
                      n_devices=1, seed=0)
    tr = Trainer(cfg, train_data, cv_data, train_data_init=init_data,
                 cv_data_init=init_data, nn_dir=str(tmp_path))
    tr.train()
    # Trainer nests the run under nn_dir/<run_name> (multigpu.py's
    # hyperparameter-encoded directory)
    from pbml_mantle_convection_tpu.train.trainer import parse_loss_log
    log = os.path.join(tr.nn_dir, "fluidnet_uvpT.txt")
    assert os.path.exists(log)
    entries = parse_loss_log(log)
    assert len(entries) == 2
    for e in entries:
        assert np.isfinite(e["train"]).all() and np.isfinite(e["cv"]).all()
