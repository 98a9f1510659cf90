"""Native engine, ini generator, and profile-MLP tests."""

import os

import numpy as np
import pytest

from pbml_mantle_convection_tpu.sim.ini import GaiaIniConfig, create_ini_file
from pbml_mantle_convection_tpu.sim.profiles import calc_mlp_profile


def test_profile_mlp_against_reference_semantics(tmp_path):
    y_pred, y_prof = calc_mlp_profile([3.0], [1e8], [10.0], str(tmp_path))
    assert y_pred.shape == (1, 128)
    # boundary stamping
    assert y_pred[0, 0] == 1.0 and y_pred[0, -1] == 0.0
    # physically sensible: mean interior temperature within (0, 1.2)
    assert 0.0 < y_pred[0, 1:-1].mean() < 1.2
    # file written in "y   T" format
    lines = open(os.path.join(tmp_path, "ml_prof.txt")).readlines()
    assert len(lines) == 128
    y0, t0 = lines[0].split()
    assert float(y0) == 1.0


def test_ini_round_trip_keys(tmp_path):
    path = str(tmp_path / "Gaia.ini")
    cfg = GaiaIniConfig(mode="ML_STOKES", raq=2.5, fkt=1e7, fkp=5.0,
                        core_cool=True, radioactive_decay=True, Di=0.5,
                        solver="iterative", urf=0.9)
    create_ini_file(path, cfg)
    txt = open(path).read()
    assert "RaQ = 2.5" in txt
    assert "FKViscosity/ViscT = 10000000.0" in txt
    assert "MCEnergy = Boussinesq/Compress" in txt
    assert "Core/Cooling, RadioactiveDecay" in txt
    assert "urf_mm = 0.9" in txt
    assert "MUMPS" not in txt
    cfg2 = GaiaIniConfig(solver="mumps")
    create_ini_file(path, cfg2)
    assert "MMSolver = MUMPS" in open(path).read()


class TestNativeEngine:
    @pytest.fixture(scope="class")
    def sim(self, tmp_path_factory):
        try:
            from pbml_mantle_convection_tpu.sim.gaia_native import Direct
        except Exception as e:  # pragma: no cover - no compiler
            pytest.skip(f"native build unavailable: {e}")
        tmp = tmp_path_factory.mktemp("gaia")
        ini = str(tmp / "Gaia.ini")
        create_ini_file(ini, GaiaIniConfig(
            mode="ML_STOKES", raq=2.0, fkt=1e7, fkp=3.0, layers=30,
            aspect_ratio=2.0))
        sim = Direct()
        sim.init1()
        sim.iniLoad("ini/default.ini")  # absent → ignored, like symlinked default
        sim.iniLoad(ini)
        sim.init2()
        return sim

    def test_state_contract(self, sim):
        state = sim.getState()
        H, W = sim.shape
        assert (H, W) == (32, 62)
        N = H * W
        assert state["T"].shape == (N,)
        assert state["v"].shape == (N, 3)
        assert state["pos"].shape == (N, 2)
        # grid clamped to [0, AR] × [0, 1]
        assert state["pos"][:, 0].max() == 2.0
        assert state["pos"][:, 1].max() == 1.0
        # BCs stamped
        T = state["T"].reshape(H, W)
        assert np.allclose(T[0], 1.0) and np.allclose(T[-1], 0.0)

    def test_timestep_and_state_mutation(self, sim):
        state = sim.getState()
        H, W = sim.shape
        # write a velocity field through the zero-copy view, like the
        # driver does (advect_wi_gaia.py:603-616)
        rng = np.random.default_rng(0)
        u = rng.normal(size=(H, W)) * 10
        v = rng.normal(size=(H, W)) * 10
        state["v"][:, 0] = u.reshape(-1)
        state["v"][:, 1] = v.reshape(-1)
        T_before = state["T"].copy()
        dt = sim.doTimestep()
        assert dt > 0
        for _ in range(5):
            sim.doTimestep()
        assert np.abs(state["T"] - T_before).max() > 0
        assert np.isfinite(state["T"]).all()
        # time advanced; raw.time settable like the reference's driver
        t = state["raw"].time
        assert t > 0
        state["raw"].time = 5.0
        assert state["raw"].time == 5.0

    def test_viscosity_is_fk(self, sim):
        state = sim.getState()
        H, W = sim.shape
        T = state["T"].reshape(H, W)
        y = state["pos"][:, 1].reshape(H, W)
        eta = np.exp(np.log(1e7) * (0 - T) + np.log(3.0) * (1 - y))
        np.testing.assert_allclose(state["V"].reshape(H, W), eta,
                                   rtol=1e-10)

    def test_pure_diffusion_stays_bounded(self, sim):
        state = sim.getState()
        state["v"][:] = 0.0
        for _ in range(50):
            sim.doTimestep()
        T = state["T"]
        assert np.isfinite(T).all()
        assert T.min() >= 0.0 and T.max() <= 2.0
        H, W = sim.shape
        # Dirichlet plates hold under pure diffusion
        Tg = T.reshape(H, W)
        assert np.allclose(Tg[0], 1.0) and np.allclose(Tg[-1], 0.0)

    def test_native_momentum_matches_jax_pt_solver(self, tmp_path):
        """Cross-implementation equivalence of the MOMENTUM side: the C++
        urf_mm iterative solve (gaia_engine.cpp:solve_momentum) mirrors
        physics/stokes.py:PTStokesSolver operation for operation, so the
        two must agree to near machine precision after the same number of
        PT iterations (VERDICT round-1 item 5; GAIA solver config
        prepare_gaia_ini.py:139-146)."""
        try:
            from pbml_mantle_convection_tpu.sim.gaia_native import Direct
        except Exception as e:  # pragma: no cover - no compiler
            pytest.skip(f"native build unavailable: {e}")
        import jax.numpy as jnp
        from pbml_mantle_convection_tpu.physics.stokes import PTStokesSolver

        ini = str(tmp_path / "Gaia.ini")
        create_ini_file(ini, GaiaIniConfig(
            mode="GAIA", raq=5.0, fkt=1e4, fkp=3.0, layers=16,
            aspect_ratio=2.0, solver="iterative", urf=1.0))
        sim = Direct()
        sim.init1()
        sim.iniLoad(ini)
        sim.init2()
        H, W = sim.shape
        assert (H, W) == (18, 34)
        state = sim.getState()

        # smooth temperature blob; refresh FK viscosity from it
        y = state["pos"][:, 1].reshape(H, W)
        x = state["pos"][:, 0].reshape(H, W)
        T0 = (1.0 - y) + 0.2 * np.exp(
            -((x - 0.75) ** 2 + (y - 0.4) ** 2) / 0.05)
        T0[0], T0[-1] = 1.0, 0.0
        state["T"][:] = T0.reshape(-1)
        sim.updateViscosity()
        V0 = state["V"].reshape(H, W).copy()

        n_iter = 1500
        sim.solveMomentum(n_iter)

        solver = PTStokesSolver(
            ny=H - 2, nx=W - 2, dy=1.0 / 16, dx=2.0 / (W - 2),
            raq=5.0, n_iter=n_iter, ptol=0.0)   # fixed-count parity
        res = solver.solve(jnp.asarray(T0[1:-1, 1:-1]),
                           jnp.asarray(V0[1:-1, 1:-1]))

        np.testing.assert_allclose(
            state["v"][:, 0].reshape(H, W), np.asarray(res.u),
            rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            state["v"][:, 1].reshape(H, W), np.asarray(res.v),
            rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            state["P"].reshape(H, W), np.asarray(res.p),
            rtol=1e-9, atol=1e-12)

    def test_native_self_contained_gaia_mode(self, tmp_path):
        """mode=GAIA fully native: with setSolveMomentum(True) the engine
        solves its own momentum each step (no caller velocities) and the
        coupled run develops convective flow."""
        try:
            from pbml_mantle_convection_tpu.sim.gaia_native import Direct
        except Exception as e:  # pragma: no cover - no compiler
            pytest.skip(f"native build unavailable: {e}")
        ini = str(tmp_path / "Gaia.ini")
        create_ini_file(ini, GaiaIniConfig(
            mode="GAIA", raq=5.0, fkt=1e3, fkp=2.0, layers=16,
            aspect_ratio=2.0, solver="iterative", urf=1.0))
        sim = Direct()
        sim.init1()
        sim.iniLoad(ini)
        sim.iniLoad(ini)
        sim.init2()
        sim.setSolveMomentum(True)
        state = sim.getState()
        for _ in range(5):
            dt = sim.doTimestep()
            assert dt > 0
        assert np.isfinite(state["T"]).all()
        # momentum was solved natively: nonzero interior velocities
        H, W = sim.shape
        v = state["v"][:, 1].reshape(H, W)
        assert np.abs(v[1:-1, 1:-1]).max() > 0

    def test_energy_step_matches_jax(self, sim):
        """Cross-implementation equivalence: the C++ energy step and the
        JAX advect_diffuse_step produce the same field from the same
        (state, velocities, dt).

        Uses the dt-override hook so both sides integrate the exact same
        step; metrics are built from the NATIVE grid's own pos so only
        the update rule is under test. Both implement the reference's
        upwind + conservative-diffusion scheme
        (pytorch_networks_convae.py:522-568)."""
        import jax.numpy as jnp
        from pbml_mantle_convection_tpu.physics.advection import (
            advect_diffuse_step, grid_metrics)

        state = sim.getState()
        H, W = sim.shape
        rng = np.random.default_rng(7)
        u = rng.normal(size=(H, W)) * 20
        v = rng.normal(size=(H, W)) * 20
        state["v"][:, 0] = u.reshape(-1)
        state["v"][:, 1] = v.reshape(-1)
        # a mid-range field so the native [0, 2] clip never triggers
        T0 = 0.3 + 0.4 * rng.random((H, W))
        T0[0], T0[-1] = 1.0, 0.0
        T0[:, 0], T0[:, -1] = T0[:, 1], T0[:, -2]
        state["T"][:] = T0.reshape(-1)

        xc = state["pos"][:, 0].reshape(H, W).copy()
        yc = state["pos"][:, 1].reshape(H, W).copy()
        metrics = grid_metrics(jnp.asarray(xc), jnp.asarray(yc),
                               aspect=2.0)

        dt = 2e-5
        T_jax = jnp.asarray(T0)[None]
        for _ in range(3):
            sim.doTimestepDt(dt)
            T_jax, _ = advect_diffuse_step(
                jnp.asarray(u)[None], jnp.asarray(v)[None], T_jax,
                2.0, metrics, dt=jnp.asarray(dt))
        np.testing.assert_allclose(
            state["T"].reshape(H, W), np.asarray(T_jax[0]),
            rtol=1e-12, atol=1e-14)

    def test_eba_energy_step_matches_jax(self, tmp_path):
        """Di > 0 cross-implementation equivalence: the C++ EBA energy
        step (adiabatic -Di·v·T + viscous dissipation +Di·Φ,
        gaia_engine.cpp do_timestep_dt) equals the JAX composition
        advect_diffuse_step(src = RaQ - Di·v·T + Di·Φ) with Φ from
        physics/advection.py::viscous_dissipation — both implement
        GAIA's MCEnergy=Boussinesq/Compress (prepare_gaia_ini.py:61-62)
        with Ra=1, T0=0 (prepare_gaia_ini.py:117,125)."""
        try:
            from pbml_mantle_convection_tpu.sim.gaia_native import Direct
        except Exception as e:  # pragma: no cover - no compiler
            pytest.skip(f"native build unavailable: {e}")
        import jax.numpy as jnp
        from pbml_mantle_convection_tpu.physics.advection import (
            advect_diffuse_step, grid_metrics, viscous_dissipation)

        ini = str(tmp_path / "Gaia.ini")
        create_ini_file(ini, GaiaIniConfig(
            mode="ML_STOKES", raq=2.0, fkt=1e5, fkp=3.0, layers=30,
            aspect_ratio=2.0, Di=0.5))
        sim = Direct()
        sim.init1()
        sim.iniLoad(ini)
        sim.init2()
        H, W = sim.shape
        state = sim.getState()

        rng = np.random.default_rng(11)
        u = rng.normal(size=(H, W)) * 20
        v = rng.normal(size=(H, W)) * 20
        state["v"][:, 0] = u.reshape(-1)
        state["v"][:, 1] = v.reshape(-1)
        T0 = 0.3 + 0.4 * rng.random((H, W))
        T0[0], T0[-1] = 1.0, 0.0
        T0[:, 0], T0[:, -1] = T0[:, 1], T0[:, -2]
        state["T"][:] = T0.reshape(-1)
        sim.updateViscosity()

        xc = state["pos"][:, 0].reshape(H, W).copy()
        yc = state["pos"][:, 1].reshape(H, W).copy()
        metrics = grid_metrics(jnp.asarray(xc), jnp.asarray(yc),
                               aspect=2.0)

        Di, dt = 0.5, 2e-6
        uj, vj = jnp.asarray(u)[None], jnp.asarray(v)[None]
        T_jax = jnp.asarray(T0)[None]
        for _ in range(3):
            # the native step consumes the PRE-step FK viscosity (it
            # refreshes V from the new T only afterwards) — read it
            # before stepping; the FK rule itself is pinned by
            # test_viscosity_is_fk
            Vj = jnp.asarray(state["V"].reshape(H, W).copy())[None]
            sim.doTimestepDt(dt)
            src = (2.0
                   - Di * vj[..., 1:-1, 1:-1] * T_jax[..., 1:-1, 1:-1]
                   + Di * viscous_dissipation(uj, vj, Vj, metrics))
            T_jax, _ = advect_diffuse_step(
                uj, vj, T_jax, src, metrics, dt=jnp.asarray(dt))
        np.testing.assert_allclose(
            state["T"].reshape(H, W), np.asarray(T_jax[0]),
            rtol=1e-12, atol=1e-14)
