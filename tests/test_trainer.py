"""End-to-end Trainer tests on synthetic data."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from pbml_mantle_convection_tpu.constants import SimParams
from pbml_mantle_convection_tpu.data import SnapshotDataset, synthetic_store
from pbml_mantle_convection_tpu.models import ModelConfig
from pbml_mantle_convection_tpu.train import (
    TrainConfig, Trainer, best_epoch_from_log, parse_loss_log)


def _datasets():
    params = [SimParams(3.0, 1e8, 10.0), SimParams(1.0, 1e7, 3.0)]
    train = SnapshotDataset(
        synthetic_store(params_list=params, n_snapshots=8, seed=0))
    cv = SnapshotDataset(
        synthetic_store(params_list=params[:1], n_snapshots=4, seed=1))
    init = SnapshotDataset(
        synthetic_store(params_list=params, n_snapshots=2, seed=2))
    return train, cv, init


def _cfg(**kw):
    mc = ModelConfig(network="newfluidnet", levels=2, c_h=8, repeats=1,
                     kernel=5, r_p="replicate", loss_type="curl",
                     p_pred=False, H=32, W=68)
    return TrainConfig(model=mc, epochs=2, batch_size=4, start_lr=1e-3,
                       milestones=(1,), **kw)


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    train, cv, init = _datasets()
    tr = Trainer(_cfg(), train, cv, train_data_init=init,
                 cv_data_init=init, nn_dir=str(tmp_path))
    tr.train(2)

    log = parse_loss_log(tr.log_path)
    assert len(log) == 2
    assert log[0]["epoch"] == 0 and log[1]["epoch"] == 1
    # MultiStepLR: milestone at 1 → lr halves
    assert log[1]["lr"] == log[0]["lr"] / 2
    # reference semantics: second-to-last logged epoch
    # (advect_wi_gaia.py:416, 426 — last_epochs[-1] - 1)
    assert best_epoch_from_log(tr.log_path) == 0
    # checkpoints exist
    assert os.path.exists(os.path.join(tr.nn_dir, "0_fluidnet_uvp.ckpt"))
    assert os.path.exists(os.path.join(tr.nn_dir, "1_fluidnet_uvp.ckpt"))


@pytest.mark.slow
def test_trainer_restart(tmp_path):
    train, cv, init = _datasets()
    tr = Trainer(_cfg(), train, cv, nn_dir=str(tmp_path))
    tr.train(2)
    p0 = tr.params

    tr2 = Trainer(_cfg(), train, cv, nn_dir=str(tmp_path), restart=True)
    assert tr2.start_epoch == 2
    # params round-trip through the checkpoint
    import jax
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(tr2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_loss_decreases(tmp_path):
    train, cv, init = _datasets()
    cfg = _cfg()
    tr = Trainer(cfg, train, cv, nn_dir=str(tmp_path))
    tr.train(2)
    log = parse_loss_log(tr.log_path)
    # u-loss should improve between the two epochs on this easy set
    assert log[1]["train"][0] < log[0]["train"][0] * 1.5


def test_schedule_for_derivation():
    """Single source of truth for the epoch/milestone schedule
    (multigpu.py:1059-1070), incl. the ifluidnet special case."""
    assert TrainConfig.schedule_for("newfluidnet", False) == (
        150, (20, 40, 60, 80, 180, 120))
    assert TrainConfig.schedule_for("newfluidnet", True) == (
        1500, (20, 200, 400, 600, 800, 1000))
    assert TrainConfig.schedule_for("ifluidnet", False) == (
        40, (2, 7, 12, 17, 25))
    assert TrainConfig.schedule_for("ifluidnet", True) == (
        80, (4, 14, 24, 34, 50))


def test_small_batch_clamped_at_tiny_batch_size(tmp_path):
    """batch_size=2 with init mixing must keep >=1 main example per
    batch (small_batch is clamped, not the reference's crash)."""
    train, cv, init = _datasets()
    cfg = _cfg()
    cfg = TrainConfig(model=cfg.model, epochs=1, batch_size=2,
                      start_lr=1e-3, milestones=(1,))
    tr = Trainer(cfg, train, cv, train_data_init=init,
                 cv_data_init=init, nn_dir=str(tmp_path))
    assert tr.small_batch == 1
    cfg1 = TrainConfig(model=cfg.model, epochs=1, batch_size=1,
                       start_lr=1e-3, milestones=(1,))
    tr1 = Trainer(cfg1, train, cv, train_data_init=init,
                  cv_data_init=init, nn_dir=str(tmp_path))
    assert tr1.small_batch == 0
