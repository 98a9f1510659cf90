"""Fast (space-to-depth) execution path: exactness vs the standard model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models import NewFluidNet
from pbml_mantle_convection_tpu.models.fast_path import FastNewFluidNet
from pbml_mantle_convection_tpu.ops.s2d import (
    avg_pool_rect, conv_s2d, depth_to_space, depth_to_space_rect,
    s2d_conv_weights, space_to_depth, space_to_depth_rect)


class TestS2DConv:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)))
        y = depth_to_space(space_to_depth(x, 4), 4, 3)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.parametrize("K,f", [(5, 4), (3, 4), (5, 2), (3, 2)])
    def test_conv_equivalence(self, K, f):
        """s2d conv == dense zero-pad SAME conv, everywhere."""
        from jax import lax
        rng = np.random.default_rng(1)
        Ci, Co = 3, 5
        x = jnp.asarray(rng.normal(size=(1, 16, 32, Ci)))
        w = rng.normal(size=(K, K, Ci, Co))

        dense = lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fast = depth_to_space(
            conv_s2d(space_to_depth(x, f),
                     jnp.asarray(s2d_conv_weights(w, f))), f, Co)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                                   rtol=1e-10, atol=1e-12)


class TestRectOps:
    def test_avg_pool_rect_equivalence(self):
        from pbml_mantle_convection_tpu.ops.resize import avg_pool_nhwc
        rng = np.random.default_rng(3)
        c = 5
        x = jnp.asarray(rng.normal(size=(2, 16, 24, c)))
        x6 = space_to_depth_rect(x, 2, 4)
        ref = space_to_depth_rect(avg_pool_nhwc(x, 2), 2, 4)
        out = avg_pool_rect(x6, c)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-14)

    def test_rect_s2d_roundtrip_and_conv(self):
        from jax import lax
        from pbml_mantle_convection_tpu.ops.s2d import (
            s2d_conv_weights_rect)
        rng = np.random.default_rng(4)
        Ci, Co = 3, 4
        x = jnp.asarray(rng.normal(size=(1, 16, 24, Ci)))
        y = depth_to_space_rect(space_to_depth_rect(x, 2, 4), 2, 4, Ci)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        w = rng.normal(size=(5, 5, Ci, Co))
        dense = lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x6 = space_to_depth_rect(x, 2, 4)
        w6 = jnp.asarray(s2d_conv_weights_rect(w, 2, 4))
        fast6 = lax.conv_general_dilated(
            x6, w6, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fast = depth_to_space_rect(fast6, 2, 4, Co)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                                   rtol=1e-10, atol=1e-12)


def _check_model(r_p, H, W, levels=3, repeats=2, p_pred=False, blurr=False):
    model = NewFluidNet(levels=levels, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p=r_p, loss_type="curl", repeats=repeats, f=5,
                        p_pred=p_pred, blurr=blurr)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, H, W, 7)))
    params = model.init(jax.random.PRNGKey(0), x)
    u0, v0, p0 = model.apply(params, x)
    fast = FastNewFluidNet(model, params, H, W, f=4)
    u1, v1, p1 = fast(x)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-8,
                               atol=1e-10)
    if p_pred:
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-8, atol=1e-10)


class TestFastNewFluidNet:
    @pytest.mark.slow
    def test_learned_divisible_grid(self):
        _check_model("learned", 32, 64)

    @pytest.mark.parametrize("r_p", [
        "learned", pytest.param("zeros", marks=pytest.mark.slow)])
    def test_megakernel_full_model(self, r_p):
        """B=1 on a fully divisible grid routes through the whole-branch
        Pallas megakernel (ops/branch_kernel.py); must equal the module."""
        model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                            r_p=r_p, loss_type="curl", repeats=2, f=5,
                            p_pred=False)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 16, 32, 7)))
        params = model.init(jax.random.PRNGKey(0), x)
        u0, v0, _ = model.apply(params, x)
        fast = FastNewFluidNet(model, params, 16, 32, f=4,
                               megakernel=True)
        assert fast.use_megakernel
        u1, v1, _ = fast(x)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=1e-8, atol=1e-10)

    @pytest.mark.slow
    def test_learned_reference_grid_shape(self):
        # 506 is not divisible by 4 → exercises padding + masked GN
        _check_model("learned", 32, 54)

    @pytest.mark.slow
    def test_zeros_padding(self):
        _check_model("zeros", 32, 64)

    @pytest.mark.slow
    def test_zeros_nondivisible(self):
        _check_model("zeros", 36, 54)

    @pytest.mark.slow
    def test_with_pressure(self):
        _check_model("learned", 32, 64, p_pred=True)

    @pytest.mark.slow
    def test_full_reference_grid(self):
        _check_model("learned", 128, 506, levels=2, repeats=1)


@pytest.mark.slow
def test_fast_inexact_mode_close():
    """Opt-in bf16-trunk + tanh-GELU mode stays within ~1% of exact."""
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=1, f=5,
                        p_pred=False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 32, 64, 7)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    u0, v0, _ = FastNewFluidNet(model, params, 32, 64)(x)
    u1, v1, _ = FastNewFluidNet(model, params, 32, 64, conv_bf16=True,
                                approx_gelu=True)(x)
    scale = float(jnp.max(jnp.abs(u0))) + 1e-30
    assert float(jnp.max(jnp.abs(u1 - u0))) / scale < 0.02


@pytest.mark.parametrize("r_p", [
    "learned", pytest.param("zeros", marks=pytest.mark.slow)])
@pytest.mark.parametrize("shape", [
    (16, 30, 2),            # W%4=2; pooled level W=15 (%4=3, two-eval)
    pytest.param((16, 29, 2), marks=pytest.mark.slow),   # W%4=1
    (16, 31, 2),            # W%4=3: the two-eval ragged plan at the TOP
    # level — merge trunk included (default-tier per ADVICE r4: the
    # two-eval un-park path must stay covered by the default run)
    pytest.param((32, 54, 3), marks=pytest.mark.slow)])
def test_megakernel_ragged_width(r_p, shape):
    """Non-4-divisible widths route through the megakernel path on a
    ragged last block column (ops/branch_kernel._ragged_plan) — the
    reference's own 128×506 grid chain (506/253/126/63/31) is the
    production case. Must equal the module like the aligned path."""
    H, W, levels = shape
    model = NewFluidNet(levels=levels, c_i=7, c_h=8, c_o=1,
                        act_fn="gelu", r_p=r_p, loss_type="curl",
                        repeats=2, f=5, p_pred=False)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, H, W, 7)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    u0, v0, _ = model.apply(params, x)
    fast = FastNewFluidNet(model, params, H, W, f=4, megakernel=True)
    assert fast.use_megakernel
    u1, v1, _ = fast(x)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=1e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-6, atol=2e-6)


@pytest.mark.slow
def test_megakernel_reference_grid():
    """The flagship 5-level megakernel stack compiles and matches the
    module at the reference's production 128×506 grid
    (prepare_gaia_ini.py:23-26) — the round-3 perf target shape."""
    model = NewFluidNet(levels=5, c_i=7, c_h=16, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=2,
                        f=5, p_pred=False)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(1, 128, 506, 7)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    u0, v0, _ = model.apply(params, x)
    fast = FastNewFluidNet(model, params, 128, 506, f=4,
                           megakernel=True)
    assert fast.use_megakernel
    u1, v1, _ = fast(x)
    scale = float(np.abs(np.asarray(u0)).max()) + 1e-30
    assert float(np.abs(np.asarray(u1 - u0)).max()) / scale < 1e-5
    assert float(np.abs(np.asarray(v1 - v0)).max()) / scale < 1e-5


def test_megakernel_tpu_numerics_bound():
    """Pin the shipped TPU path's numeric deviation in CI without a chip
    (ADVICE r2): mk_tpu_numerics=True runs the interpret kernels with
    the TPU storage/activation numerics — bf16 conv weights, bf16-cast
    activations into every conv dot, the divide-free GELU fit — so the
    default-path deviation vs the f32 Flax module is bounded by a test
    (PARITY.md "TPU precision" documents ~1e-2 relative worst-case at
    256² with 34 GroupNorm layers amplifying the conv noise)."""
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=2, f=5,
                        p_pred=False)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 7)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    u0, v0, _ = model.apply(params, x)
    fast = FastNewFluidNet(model, params, 16, 32, f=4, megakernel=True,
                           mk_tpu_numerics=True)
    assert fast.use_megakernel
    u1, v1, _ = fast(x)
    scale = float(np.abs(np.asarray(u0)).max()) + 1e-30
    du = float(np.abs(np.asarray(u1 - u0)).max()) / scale
    dv = float(np.abs(np.asarray(v1 - v0)).max()) / scale
    # must actually exercise the inexact numerics ...
    assert du > 1e-7
    # ... and stay inside the documented TPU noise class
    assert du < 2e-2 and dv < 2e-2


def test_s2d_rect_sliced_bitwise():
    """The sliced lowering of the rect s2d is the same permutation."""
    from pbml_mantle_convection_tpu.ops.s2d import (
        space_to_depth_rect, space_to_depth_rect_sliced)
    rng = np.random.default_rng(3)
    for (H, W, C) in [(8, 16, 1), (16, 32, 7), (6, 8, 3)]:
        x = jnp.asarray(rng.normal(size=(1, H, W, C)), jnp.float32)
        a = np.asarray(space_to_depth_rect(x, 2, 4))
        b = np.asarray(space_to_depth_rect_sliced(x, 2, 4))
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape", [
    (16, 32), pytest.param((16, 30), marks=pytest.mark.slow)])
def test_hoisted_input_assembly(shape):
    """apply_from_T (T-only hoisted input relayout) equals the dense
    assemble + __call__ route, and the hoisted stepper.stokes equals the
    plain-module stokes — including on a ragged width."""
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import (
        TimeStepper, assemble_fluidnet_input)
    H, W = shape
    grid = Grid(H=H, W=W, aspect=(W - 2) / (H - 2), dtype="float32")
    params_phys = SimParams(raq=3.0, fkt=1e6, fkp=10.0)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=2,
                        f=5, p_pred=False)
    T = jnp.clip(1.0 - grid.yc + 0.05 * jnp.sin(6.28 * grid.xc),
                 0.0, 1.0).astype(jnp.float32)[None]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 7), jnp.float32))
    fast = FastNewFluidNet(model, params, H, W, f=4, megakernel=True)

    stepper = TimeStepper(grid=grid, params=params_phys, apply_fn=fast,
                          cn_max=0.99, dtype=jnp.float32)
    assert fast.bind_input_assembly(stepper._static, params_phys)

    x, V_ref = assemble_fluidnet_input(T, stepper._static, params_phys)
    u0, v0, _ = fast(x)
    u1, v1, _ = fast.apply_from_T(T)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-7, atol=1e-9)

    # the stepper route binds automatically, returns bitwise V and the
    # same scaled velocities as the dense-assembly megakernel route
    # (the lambda hides bind_input_assembly, forcing the dense path)
    stepper_dense = TimeStepper(grid=grid, params=params_phys,
                                apply_fn=lambda xx: fast(xx),
                                cn_max=0.99, dtype=jnp.float32)
    um, vm, _, Vm = stepper_dense.stokes(T)
    uh, vh, _, Vh = stepper.stokes(T)
    np.testing.assert_allclose(np.asarray(Vh), np.asarray(Vm),
                               rtol=0, atol=0)
    sc = float(np.abs(np.asarray(um)).max()) + 1e-30
    assert float(np.abs(np.asarray(uh - um)).max()) / sc < 1e-6
    assert float(np.abs(np.asarray(vh - vm)).max()) / sc < 1e-6


def test_hoisted_input_assembly_retrace():
    """Binding inside a jitted scan must not leak trace-time tracers
    into a later retrace (regression: the hoisted constants are built
    under ensure_compile_time_eval)."""
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper
    H, W = 16, 32
    grid = Grid(H=H, W=W, aspect=(W - 2) / (H - 2), dtype="float32")
    pp = SimParams(3.0, 1e8, 10.0)
    model = NewFluidNet(levels=2, c_i=7, c_h=8, c_o=1, act_fn="gelu",
                        r_p="learned", loss_type="curl", repeats=1,
                        f=5, p_pred=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 7), jnp.float32))
    fast = FastNewFluidNet(model, params, H, W, megakernel=True)
    stepper = TimeStepper(grid=grid, params=pp, apply_fn=fast,
                          dtype=jnp.float32)
    eng = SimEngine(grid=grid, params=pp, stepper=stepper,
                    dtype=jnp.float32)
    T0 = jnp.clip(1.0 - grid.yc, 0, 1)[None]
    state = eng.init_state(T0)
    multi = jax.jit(eng.multi_step, static_argnums=1)
    state, _ = multi(state, 2)        # binds inside this trace
    state, tr = multi(state, 1)       # retrace must not see leaked trs
    assert np.isfinite(float(tr.mean_T[-1]))
    assert fast.input_hoisted
