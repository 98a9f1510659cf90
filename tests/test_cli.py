"""CLI smoke tests (tiny configs, synthetic data)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    from pbml_mantle_convection_tpu.cli.train import main
    tr = main(["-net", "newfluidnet", "-l", "2", "-f", "8", "-r", "1",
               "-k", "5", "-p", "replicate", "-lt", "curl", "-b", "4",
               "--synthetic", "--epochs", "1",
               "--nn_dir", str(tmp_path)])
    log = os.path.join(tr.nn_dir, "fluidnet_uvpT.txt")
    assert os.path.exists(log)
    lines = open(log).readlines()
    assert len(lines) == 2 and lines[0].startswith("Epoch")


@pytest.mark.slow
def test_rollout_cli_jax(tmp_path):
    from pbml_mantle_convection_tpu.cli.rollout import main
    main(["-m", "ML_STOKES", "-raq", "3.0", "-fkt", "1e8", "-fkp", "10",
          "-l", "2", "-f", "8", "-r", "1", "-pad", "replicate",
          "-init", "perfect", "--engine", "jax", "--max_steps", "6",
          "--out_dir", str(tmp_path)])
    runs = os.listdir(tmp_path)
    assert len(runs) == 1
    run = tmp_path / runs[0]
    for f in ("Gaia.ini", "ml_prof.txt", "snapshots_ML_STOKES.pkl",
              "T_vec_ML_STOKES.pkl", "t_vec_ML_STOKES.pkl",
              "TS_vec_ML_STOKES.pkl"):
        assert (run / f).exists(), f
    from pbml_mantle_convection_tpu.utils.checkpoint import load_pickle
    T_vec = load_pickle(str(run / "T_vec_ML_STOKES.pkl"))
    assert len(T_vec) == 6 and np.isfinite(T_vec).all()


@pytest.mark.slow
def test_rollout_cli_native(tmp_path):
    pytest.importorskip("ctypes")
    from pbml_mantle_convection_tpu.cli.rollout import main
    try:
        out = main(["-m", "ML_STOKES", "-raq", "2.0", "-fkt", "1e7",
                    "-fkp", "3", "-l", "2", "-f", "8", "-r", "1",
                    "-pad", "replicate", "--engine", "native",
                    "--max_steps", "4", "--out_dir", str(tmp_path)])
    except Exception as e:  # pragma: no cover - no compiler
        pytest.skip(f"native unavailable: {e}")
    t, n_step = out[0], out[1]
    assert n_step == 4 and t > 0


@pytest.mark.slow
def test_benchmark_cli_inference(capsys):
    from pbml_mantle_convection_tpu.cli.benchmark import main
    ms = main(["--what", "inference", "-net", "newfluidnet", "-l", "2",
               "-f", "8", "-r", "1", "-pad", "replicate",
               "--H", "32", "--W", "64", "--iters", "3"])
    assert ms > 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["unit"] == "ms"
