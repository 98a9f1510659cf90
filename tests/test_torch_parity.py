"""Numerical parity against the actual reference PyTorch models.

These tests load the reference implementation from ``/root/reference``
(read-only mount), build the same architecture there and here, convert the
torch weights with utils/torch_convert, and require the forward passes to
agree to float64 round-off. Skipped when the reference isn't mounted.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = os.environ.get("REFERENCE_DIR", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def torch_mods():
    torch = pytest.importorskip("torch")
    # The reference imports torchvision only for an optional GaussianBlur
    # (pytorch_networks_convae.py:11); stub it when absent.
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
    try:
        import pytorch_networks_convae as ref
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference: {e}")
    return torch, ref


def _run_pair(torch, ref_model, our_model, our_params, x_np,
              unet=False):
    import torch as _t
    with _t.no_grad():
        tout = ref_model(_t.tensor(x_np, dtype=_t.float64))
    jout = our_model.apply(our_params,
                           jnp.asarray(x_np.transpose(0, 2, 3, 1)))
    return tout, jout


@pytest.mark.parametrize("r_p", [
    pytest.param("replicate", marks=pytest.mark.slow), "learned"])
@pytest.mark.parametrize("use_symm", [False, True])
def test_newfluidnet_forward_parity(torch_mods, r_p, use_symm):
    torch, ref = torch_mods
    from pbml_mantle_convection_tpu.models import NewFluidNet
    from pbml_mantle_convection_tpu.utils.torch_convert import (
        convert_fluidnet)

    levels, c_h, repeats, k = 3, 8, 2, 5
    tm = ref.NewFluidNet(
        levels, 7, c_h, 1, torch.device("cpu"), "gelu", r_p, "curl",
        use_symm=use_symm, a_bound=10, repeats=repeats, f=k,
        p_pred=False).double()
    tm.eval()

    sd = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_fluidnet(sd, levels,
                                                        repeats))

    jm = NewFluidNet(levels=levels, c_i=7, c_h=c_h, c_o=1, act_fn="gelu",
                     r_p=r_p, loss_type="curl", use_symm=use_symm,
                     a_bound=10, repeats=repeats, f=k, p_pred=False)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 7, 128, 506))
    tout, jout = _run_pair(torch, tm, jm, params, x)

    np.testing.assert_allclose(np.asarray(jout[0]), tout[0].numpy(),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jout[1]), tout[1].numpy(),
                               rtol=1e-9, atol=1e-10)


def test_fluidnet_forward_parity(torch_mods):
    torch, ref = torch_mods
    from pbml_mantle_convection_tpu.models import FluidNet
    from pbml_mantle_convection_tpu.utils.torch_convert import (
        convert_fluidnet)

    levels, c_h, repeats, k = 2, 8, 2, 5
    tm = ref.FluidNet(
        levels, 7, c_h, 1, torch.device("cpu"), "gelu", "learned", "curl",
        use_symm=False, a_bound=10, repeats=repeats, f=k,
        p_pred=False).double()
    tm.eval()
    sd = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray,
                          convert_fluidnet(sd, levels, repeats))
    jm = FluidNet(levels=levels, c_i=7, c_h=c_h, c_o=1, act_fn="gelu",
                  r_p="learned", loss_type="curl", a_bound=10,
                  repeats=repeats, f=k, p_pred=False)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 7, 128, 506))
    tout, jout = _run_pair(torch, tm, jm, params, x)
    np.testing.assert_allclose(np.asarray(jout[0]), tout[0].numpy(),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jout[1]), tout[1].numpy(),
                               rtol=1e-9, atol=1e-10)


def test_unet_forward_parity(torch_mods):
    torch, ref = torch_mods
    from pbml_mantle_convection_tpu.models import Unet
    from pbml_mantle_convection_tpu.utils.torch_convert import convert_unet

    levels, c_h, repeats, k = 3, 8, 2, 5
    tm = ref.Unet(
        levels, 10, c_h, 2, torch.device("cpu"), "gelu", "replicate",
        "curl", a_bound=10, repeats=repeats, f=k, p_pred=False).double()
    tm.eval()
    sd = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_unet(sd, levels, repeats))
    jm = Unet(levels=levels, c_i=10, c_h=c_h, c_o=2, act_fn="gelu",
              r_p="replicate", loss_type="curl", a_bound=10,
              repeats=repeats, f=k, p_pred=False)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 10, 128, 506))

    import torch as _t
    with _t.no_grad():
        tu, tv, tp, tT = tm(_t.tensor(x, dtype=_t.float64))
    ju, jv, jp, jT = jm.apply(params,
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ju), tu.numpy(), rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(jT), tT.numpy(), rtol=1e-9,
                               atol=1e-10)


def test_adnet_parity(torch_mods):
    """Our advection step vs the reference ADNet on the real grid."""
    torch, ref = torch_mods
    from pbml_mantle_convection_tpu.physics.advection import (
        advect_diffuse_step, grid_metrics)
    from pbml_mantle_convection_tpu.sim.grid import Grid

    g = Grid()
    rng = np.random.default_rng(3)
    u = rng.normal(size=(1, 1, 128, 506)) * 100
    v = rng.normal(size=(1, 1, 128, 506)) * 100
    T = rng.uniform(size=(1, 1, 128, 506))
    raq = 2.5

    adnet = ref.ADNet(device=torch.device("cpu"), CN_max=0.99).double()
    import torch as _t
    with _t.no_grad():
        inp = _t.cat([
            _t.tensor(u), _t.tensor(v), _t.tensor(T),
            _t.zeros_like(_t.tensor(u)) + raq,
            _t.tensor(np.asarray(g.xc))[None, None].repeat(1, 1, 1, 1),
            _t.tensor(np.asarray(g.yc))[None, None],
        ], dim=1).double()
        T_ref, dt_ref = adnet(inp)

    metrics = grid_metrics(g.xc, g.yc)
    T_ours, dt_ours = advect_diffuse_step(
        jnp.asarray(u[:, 0]), jnp.asarray(v[:, 0]), jnp.asarray(T[:, 0]),
        raq, metrics, cn_max=0.99)

    np.testing.assert_allclose(float(dt_ours), float(dt_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(T_ours), T_ref.numpy()[:, 0],
                               rtol=1e-10, atol=1e-12)


def _coupled_rollout_pair(torch_mods, n_steps, seed=4):
    """Run the reference coupled loop (TS(NewFluidNet, ADNet) iterated as
    in advect_wi_gaia.py:583-677, pure-ML mode) against SimEngine with the
    same converted weights; returns (mean-T traces, final T fields)."""
    torch, ref = torch_mods
    import torch as _t
    from pbml_mantle_convection_tpu.constants import SimParams
    from pbml_mantle_convection_tpu.models import NewFluidNet
    from pbml_mantle_convection_tpu.sim.engine import SimEngine
    from pbml_mantle_convection_tpu.sim.grid import Grid
    from pbml_mantle_convection_tpu.sim.stepper import TimeStepper
    from pbml_mantle_convection_tpu.utils.torch_convert import (
        convert_fluidnet)

    levels, c_h, repeats, k = 3, 8, 2, 5
    g = Grid()
    params = SimParams(raq=2.5, fkt=1e7, fkp=5.0)

    tm = ref.NewFluidNet(
        levels, 7, c_h, 1, torch.device("cpu"), "gelu", "learned", "curl",
        use_symm=False, a_bound=10, repeats=repeats, f=k,
        p_pred=False).double()
    tm.eval()
    sd = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
    jparams = jax.tree.map(jnp.asarray, convert_fluidnet(sd, levels,
                                                         repeats))
    jm = NewFluidNet(levels=levels, c_i=7, c_h=c_h, c_o=1, act_fn="gelu",
                     r_p="learned", loss_type="curl", use_symm=False,
                     a_bound=10, repeats=repeats, f=k, p_pred=False)

    # shared smooth initial temperature (stamped like the driver's)
    yc = np.asarray(g.yc, np.float64)
    xc = np.asarray(g.xc, np.float64)
    T0 = (1.0 - yc) + 0.05 * np.cos(np.pi * xc / g.aspect) * np.sin(
        np.pi * yc)
    T0[0, :], T0[-1, :] = 1.0, 0.0

    # --- reference loop: TS iterated step by step (ts=1, ML mode) ---
    adnet = ref.ADNet(device=torch.device("cpu"), CN_max=0.99).double()
    ts_net = ref.TS(tm, adnet, torch.device("cpu"), ts=1,
                    advection_scheme=2, scale=True, p_pred=False,
                    net="newfluidnet")
    xc_t = _t.tensor(xc)[None, None]
    yc_t = _t.tensor(yc)[None, None]
    sc = [_t.tensor(float(v), dtype=_t.float64).view(1, 1, 1, 1)
          for v in (params.raq_nd, params.fkt_nd, params.fkp_nd)]
    raq_t = _t.tensor(2.5, dtype=_t.float64)
    fkt_t = _t.tensor(1e7, dtype=_t.float64)
    fkp_t = _t.tensor(5.0, dtype=_t.float64)

    T_ref = _t.tensor(T0)[None, None]
    trace_ref = []
    with _t.no_grad():
        for _ in range(n_steps):
            x, dts, u, v, p, V = ts_net(
                T_ref, None, None, yc_t, sc[0], sc[1], sc[2],
                raq_t, fkt_t, fkp_t, xc_t, yc_t)
            T_ref = x[1]
            trace_ref.append(float(T_ref.mean()))

    # --- our engine: the same coupled step inside one lax.scan ---
    stepper = TimeStepper(grid=g, params=params,
                          apply_fn=lambda xi: jm.apply(jparams, xi),
                          net="newfluidnet", cn_max=0.99,
                          dtype=jnp.float64)
    eng = SimEngine(grid=g, params=params, stepper=stepper,
                    mode="ML_STOKES", dtype=jnp.float64)
    state = eng.init_state(jnp.asarray(T0)[None])
    state, trace = jax.jit(eng.multi_step, static_argnums=1)(
        state, n_steps)

    return (np.asarray(trace_ref), np.asarray(trace.mean_T),
            T_ref.numpy()[0, 0], np.asarray(state.T[0]))


@pytest.mark.slow
def test_coupled_rollout_parity(torch_mods):
    """Multi-step coupled-loop parity (the accuracy half of the north
    star): 50 coupled TS+ADNet steps tracked between the torch reference
    and SimEngine. Per-step agreement is ~1e-9; drift compounds ~√N, so
    the bound leaves margin above 1e-9·√50."""
    tr_ref, tr_jax, T_ref, T_jax = _coupled_rollout_pair(torch_mods, 50)
    np.testing.assert_allclose(tr_jax, tr_ref, rtol=0, atol=5e-8)
    assert np.max(np.abs(T_jax - T_ref)) < 1e-6


@pytest.mark.slow
def test_coupled_rollout_parity_500(torch_mods):
    """The full 500-step T-RMSE check (north-star accuracy clause); the
    measured figure is recorded in PARITY.md."""
    tr_ref, tr_jax, T_ref, T_jax = _coupled_rollout_pair(torch_mods, 500)
    rmse = float(np.sqrt(np.mean((T_jax - T_ref) ** 2)))
    assert rmse < 1e-6
    np.testing.assert_allclose(tr_jax, tr_ref, rtol=0, atol=5e-7)


def test_scaler_parity():
    """scale_var/unscale_var vs the reference scaler.py."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_scaler", os.path.join(REF, "scaler.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from pbml_mantle_convection_tpu.constants import scale_var, unscale_var
    rng = np.random.default_rng(0)
    for var in ("uprev", "vprev", "pprev", "Vprev", "Tprev"):
        x = rng.normal(size=(5, 7))
        ours = scale_var(x.copy(), 3.2, 1e8, 7.5, var)
        theirs = ref.scale_var(x.copy(), 3.2, 1e8, 7.5, var)
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-15)
        ours_u = unscale_var(x.copy(), 3.2, 1e8, 7.5, var)
        theirs_u = ref.unscale_var(x.copy(), 3.2, 1e8, 7.5, var)
        np.testing.assert_allclose(np.asarray(ours_u), theirs_u,
                                   rtol=1e-15)


def _parse_ini(path):
    """key -> value map, whitespace-normalized; '@include' lines under
    the 'include' key; comma lists normalized item-wise."""
    out = {}
    for raw in open(path).read().splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("@"):
            out.setdefault("include", []).append(line)
            continue
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        k, v = k.strip(), " ".join(v.split())
        items = [i.strip() for i in v.split(",")]
        out[k] = items if len(items) > 1 else v
    return out


def _values_equal(a, b):
    if isinstance(a, list) or isinstance(b, list):
        return a == b
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return a == b


@pytest.mark.parametrize("kw", [
    dict(),
    dict(solver="iterative", urf=0.7),
    dict(core_cool=True),
    dict(radioactive_decay=True),
    dict(core_cool=True, radioactive_decay=True),
    dict(initialization="linear"),
    dict(initialization="perfect"),
    dict(initialization="cold"),
    dict(Di=0.5),
])
def test_ini_file_parity(tmp_path, kw):
    """create_ini_file vs the reference prepare_gaia_ini, key for key
    (prepare_gaia_ini.py:4-151)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_ini", os.path.join(REF, "prepare_gaia_ini.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from pbml_mantle_convection_tpu.sim.ini import (
        GaiaIniConfig, create_ini_file)

    base = dict(mode="ML_STOKES", raq=2.5, fkt=1e7, fkp=5.0,
                advection_scheme=2, intervene_ts=4, warm_up_steps=10)
    ours_path = str(tmp_path / "ours.ini")
    ref_path = str(tmp_path / "ref.ini")
    create_ini_file(ours_path, GaiaIniConfig(**base, **kw))
    ref.create_ini_file(
        ref_path, base["mode"], base["raq"], base["fkt"], base["fkp"],
        base["advection_scheme"], base["intervene_ts"],
        base["warm_up_steps"], solver=kw.get("solver", "mumps"),
        initialization=kw.get("initialization", "hot"),
        urf=kw.get("urf", 1), Di=kw.get("Di", 0),
        core_cool=kw.get("core_cool", False),
        radioactive_decay=kw.get("radioactive_decay", False))

    ours = _parse_ini(ours_path)
    theirs = _parse_ini(ref_path)
    # CaseID naming is ours to choose; everything else must agree.
    ours.pop("CaseID", None), theirs.pop("CaseID", None)
    if kw.get("core_cool") and kw.get("radioactive_decay"):
        # reference bug: prepare_gaia_ini.py:75 clobbers the whole
        # "MCPostTS =" line in this combination, dropping the key from
        # its ini; we deliberately keep it (sim/ini.py).
        assert "MCPostTS" not in theirs
        assert ours.pop("MCPostTS") == ["Core/Cooling", "RadioactiveDecay"]
    missing = set(theirs) - set(ours)
    extra = set(ours) - set(theirs)
    assert not missing, f"keys missing vs reference: {missing}"
    assert not extra, f"keys not in reference: {extra}"
    diffs = {k: (ours[k], theirs[k]) for k in theirs
             if not _values_equal(ours[k], theirs[k])}
    assert not diffs, f"value mismatches: {diffs}"


def test_profile_mlp_parity(tmp_path):
    """Our profile predictor vs the reference calculate_profiles with the
    original pickle weights (calculate_profiles.py:57-134)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_profiles", os.path.join(REF, "calculate_profiles.py"))
    ref = importlib.util.module_from_spec(spec)
    import matplotlib
    matplotlib.use("Agg")
    spec.loader.exec_module(ref)

    cwd = os.getcwd()
    os.chdir(REF)  # the reference opens the pickle by relative path
    try:
        y_ref, y_prof_ref = ref.calc_mlp_profile(
            [3.0, 7.5], [1e7, 1e9], [2.0, 50.0])
    finally:
        os.chdir(cwd)

    from pbml_mantle_convection_tpu.sim.profiles import calc_mlp_profile
    y_ours, y_prof = calc_mlp_profile([3.0, 7.5], [1e7, 1e9],
                                      [2.0, 50.0])
    np.testing.assert_allclose(y_prof, y_prof_ref, rtol=1e-12)
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# Transolver / ViT numeric parity (VERDICT round-2 item 5: C22 was
# structural-only; these pin the Physics-Attention and ViT stacks to the
# actual torch modules at f64 round-off via utils/torch_convert mappings)
# ---------------------------------------------------------------------------

def _load_ref_module(name, fname):
    """Import a reference .ipynb_checkpoints module (dashed filename)
    under a clean module name so its intra-imports resolve."""
    import importlib.util
    path = os.path.join(REF, ".ipynb_checkpoints", fname)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def transolver_mods():
    torch = pytest.importorskip("torch")
    import types
    try:
        import timm  # noqa: F401
    except ImportError:
        # the reference imports timm only for trunc_normal_ init
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules.setdefault("timm", timm)
        sys.modules.setdefault("timm.models", models)
        sys.modules.setdefault("timm.models.layers", layers)
    pa = _load_ref_module("Physics_Attention",
                          "Physics_Attention-checkpoint.py")
    ts2d = _load_ref_module("Transolver_Structured_Mesh_2D_ref",
                            "Transolver_Structured_Mesh_2D-checkpoint.py")
    return torch, pa, ts2d


def _attn_params(sd):
    """Bare Physics-Attention torch module → Flax params."""
    p = {}

    def lin(name, src, bias=True):
        p[name] = {"kernel": np.asarray(sd[src + ".weight"]).T}
        if bias:
            p[name]["bias"] = np.asarray(sd[src + ".bias"])

    w = np.asarray(sd["in_project_x.weight"])
    if w.ndim == 4:
        for nm in ("in_project_x", "in_project_fx"):
            p[nm] = {
                "kernel": np.asarray(sd[nm + ".weight"]
                                     ).transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[nm + ".bias"])}
    else:
        lin("in_project_x", "in_project_x")
        lin("in_project_fx", "in_project_fx")
    lin("in_project_slice", "in_project_slice")
    for nm in ("to_q", "to_k", "to_v"):
        lin(nm, nm, bias=False)
    lin("to_out", "to_out.0")
    p["temperature"] = np.asarray(sd["temperature"])
    return {"params": p}


def test_physics_attention_structured_2d_parity(transolver_mods):
    """Physics_Attention_Structured_Mesh_2D (conv slice projections,
    clamped temperature) == PhysicsAttentionStructuredMesh2D at 1e-9.
    Reference: Physics_Attention-checkpoint.py:60-116."""
    torch, pa, _ = transolver_mods
    from pbml_mantle_convection_tpu.models.transolver import (
        PhysicsAttentionStructuredMesh2D)
    H, W, dim = 12, 20, 32
    tm = pa.Physics_Attention_Structured_Mesh_2D(
        dim, heads=4, dim_head=8, dropout=0.0, slice_num=16,
        H=H, W=W, kernel=3).double().eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H * W, dim))
    with torch.no_grad():
        ref = tm(torch.tensor(x, dtype=torch.float64)).numpy()
    ours = PhysicsAttentionStructuredMesh2D(
        dim, H=H, W=W, heads=4, dim_head=8, slice_num=16, kernel=3)
    out = ours.apply(
        _attn_params({k: v.numpy() for k, v in tm.state_dict().items()}),
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9,
                               atol=1e-11)


def test_physics_attention_irregular_parity(transolver_mods):
    """Physics_Attention_Irregular_Mesh (Linear projections, unclamped
    temperature) == PhysicsAttentionIrregularMesh at 1e-9.
    Reference: Physics_Attention-checkpoint.py:6-57."""
    torch, pa, _ = transolver_mods
    from pbml_mantle_convection_tpu.models.transolver import (
        PhysicsAttentionIrregularMesh)
    dim = 32
    tm = pa.Physics_Attention_Irregular_Mesh(
        dim, heads=4, dim_head=8, dropout=0.0, slice_num=16
    ).double().eval()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 150, dim))
    with torch.no_grad():
        ref = tm(torch.tensor(x, dtype=torch.float64)).numpy()
    ours = PhysicsAttentionIrregularMesh(dim, heads=4, dim_head=8,
                                         slice_num=16)
    out = ours.apply(
        _attn_params({k: v.numpy() for k, v in tm.state_dict().items()}),
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9,
                               atol=1e-11)


@pytest.mark.slow
def test_transolver_structured_model_parity(transolver_mods):
    """Full structured-mesh Transolver Model (preprocess → blocks →
    hard-coded 128×506 view → a_bound curl head) == our
    TransolverStructured2D end-to-end at f64. Reference:
    Transolver_Structured_Mesh_2D-checkpoint.py:80-204 (the 128×506
    view at :190 pins the grid). Converted with
    utils/torch_convert.convert_transolver."""
    torch, _, ts2d = transolver_mods
    from pbml_mantle_convection_tpu.models.transolver import (
        TransolverStructured2D)
    from pbml_mantle_convection_tpu.utils.torch_convert import (
        convert_transolver)
    H, W = 128, 506
    n_layers, n_hidden, n_head, slice_num, fun_dim = 2, 32, 4, 8, 5
    tm = ts2d.Model(torch.device("cpu"), space_dim=2,
                    n_layers=n_layers, n_hidden=n_hidden, dropout=0.0,
                    n_head=n_head, mlp_ratio=1, fun_dim=fun_dim,
                    out_dim=1, slice_num=slice_num, unified_pos=False,
                    H=H, W=W, a_bound=10.0, p_pred=False,
                    kernel=3).double().eval()
    rng = np.random.default_rng(2)
    data = rng.normal(size=(1, H * W, 2 + fun_dim))
    with torch.no_grad():
        tu, tv, _ = tm(torch.tensor(data, dtype=torch.float64))
    ours = TransolverStructured2D(
        H=H, W=W, space_dim=2, fun_dim=fun_dim, n_layers=n_layers,
        n_hidden=n_hidden, n_head=n_head, mlp_ratio=1, out_dim=1,
        slice_num=slice_num, kernel=3, a_bound=10.0, p_pred=False)
    params = convert_transolver(
        {k: v.numpy() for k, v in tm.state_dict().items()}, n_layers)
    ju, jv, _ = ours.apply(params, jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(ju), tu.numpy(), rtol=1e-9,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), rtol=1e-9,
                               atol=1e-10)


def test_vit_parity():
    """lucidrains ViT (patch embed, cls token, pre-norm transformer,
    mlp head) == models/vit.ViT at f64 via convert_vit. Reference:
    vit_pytorch-checkpoint.py:85-133."""
    torch = pytest.importorskip("torch")
    vitref = _load_ref_module("vit_pytorch_ref",
                              "vit_pytorch-checkpoint.py")
    from pbml_mantle_convection_tpu.models.vit import ViT
    from pbml_mantle_convection_tpu.utils.torch_convert import convert_vit
    H, W, C, depth = 16, 32, 5, 2
    tm = vitref.ViT(image_size=(H, W), patch_size=8, num_classes=10,
                    dim=64, depth=depth, heads=4, mlp_dim=128,
                    channels=C, dim_head=16).double().eval()
    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, C, H, W))
    with torch.no_grad():
        ref = tm(torch.tensor(img, dtype=torch.float64)).numpy()
    ours = ViT(image_size=(H, W), patch_size=(8, 8), num_classes=10,
               dim=64, depth=depth, heads=4, mlp_dim=128, channels=C,
               dim_head=16)
    params = convert_vit(
        {k: v.numpy() for k, v in tm.state_dict().items()}, depth)
    out = ours.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9,
                               atol=1e-11)
