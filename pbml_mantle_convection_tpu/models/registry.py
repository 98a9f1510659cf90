"""Model registry + channel-count derivation.

Centralizes the reference's duplicated model-factory and channel logic
(multigpu.py:492-609, 1072-1087 and advect_wi_gaia.py:307-371) into one
typed config. Registry namespace (SURVEY.md §2): newfluidnet, fluidnet,
unet, convae, multiscalenewfluidnet, transolver_structured, transolver,
vit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

from .fluidnet import (FluidNet, HalfNewFluidNet, MultiScaleNewFluidNet,
                       NewFluidNet)
from .transolver import TransolverIrregular, TransolverStructured2D
from .unet import ConvAE, Unet
from .vit import ViT


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """One typed config replacing the argparse soup + run-name encoding
    (multigpu.py:911-1087)."""

    network: str = "newfluidnet"
    levels: int = 6
    c_h: int = 16
    act_fn: str = "gelu"
    r_p: str = "learned"
    loss_type: str = "curl"
    use_symm: bool = False
    dilation: int = 1
    a_bound: float = 10.0
    repeats: int = 4
    kernel: int = 5
    p_pred: bool = False
    spectral_conv: bool = False
    blurr: bool = False
    drop_rate: float = 0.0
    factor: int = 2
    multi_scales: Sequence[float] = ()
    # transolver-specific
    n_hidden: int = 128
    n_head: int = 8
    slice_num: int = 32
    mlp_ratio: int = 1
    n_layers: int = 5
    # grid
    H: int = 128
    W: int = 506
    dtype: Any = None

    @property
    def channels(self) -> Tuple[int, int]:
        """(c_i, c_o) derivation (multigpu.py:1072-1087)."""
        net = self.network
        if net == "ifluidnet":
            # legacy iterative branch: 7 channels + the (u, v) velocity
            # iterate fed back as inputs (pycold-checkpoint.py:326-341)
            c_i, c_o = 9, 3
        elif "fluidnet" in net:
            c_i, c_o = 7, 3
        elif net == "convae":
            c_i, c_o = 3, 3
        elif net in ("unet", "iunet"):
            c_i, c_o = 11, 4
            if not self.p_pred:
                c_i -= 1
        elif "transolver" in net or net == "vit":
            c_i, c_o = 7, 3  # 2 coords + 5 function channels
        else:
            raise ValueError(f"unknown network {net!r}")
        if self.loss_type == "curl":
            c_o -= 1
        if not self.p_pred:
            c_o -= 1
        return c_i, c_o

    @property
    def run_name(self) -> str:
        """Experiment-identity string mirroring the reference's directory
        encoding (multigpu.py:1011-1055)."""
        f_nn = (
            f"{self.network}_levels_{self.levels}_{self.act_fn}_{self.c_h}"
            f"_{self.r_p}_{self.loss_type}_{self.use_symm}"
            f"_ab{int(self.a_bound)}_r{self.repeats}_k{self.kernel}"
            f"_fa{self.factor}_p_pred{self.p_pred}")
        if self.blurr:
            f_nn += "_blurr"
        return f_nn


def build_model(cfg: ModelConfig):
    """Instantiate the Flax module for ``cfg.network``."""
    c_i, c_o = cfg.channels
    common = dict(
        levels=cfg.levels, c_i=c_i, c_h=cfg.c_h, c_o=c_o,
        act_fn=cfg.act_fn, r_p=cfg.r_p, loss_type=cfg.loss_type,
        use_symm=cfg.use_symm, dilation=cfg.dilation, a_bound=cfg.a_bound,
        repeats=cfg.repeats, f=cfg.kernel, p_pred=cfg.p_pred,
        spectral_conv=cfg.spectral_conv, blurr=cfg.blurr,
        dtype=cfg.dtype)

    net = cfg.network
    if net in ("newfluidnet",):
        return NewFluidNet(**common, drop_rate=cfg.drop_rate,
                           factor=cfg.factor)
    if net in ("fluidnet", "ifluidnet"):
        # ifluidnet is the same FluidNet module with c_i=9; the velocity
        # feedback loop lives in TimeStepper.stokes_iterative
        # (pycold-checkpoint.py:322-343)
        return FluidNet(**common, drop_rate=cfg.drop_rate,
                        factor=cfg.factor)
    if net == "multiscalenewfluidnet":
        scales = tuple(cfg.multi_scales) or (1e-5, 1e-3, 1e-1, 1e1)
        return MultiScaleNewFluidNet(**common, drop_rate=cfg.drop_rate,
                                     factor=cfg.factor, scales=scales)
    if net == "halfnewfluidnet":
        return HalfNewFluidNet(**common, drop_rate=cfg.drop_rate,
                               factor=cfg.factor)
    if net in ("unet", "iunet"):
        return Unet(**common, drop_rate=cfg.drop_rate)
    if net == "convae":
        common.pop("dtype")
        return ConvAE(levels=cfg.levels, c_i=c_i, c_h=cfg.c_h, c_o=c_o,
                      act_fn=cfg.act_fn, r_p=cfg.r_p,
                      loss_type=cfg.loss_type, use_symm=cfg.use_symm,
                      dilation=cfg.dilation, a_bound=cfg.a_bound,
                      repeats=cfg.repeats, f=cfg.kernel, p_pred=cfg.p_pred,
                      spectral_conv=cfg.spectral_conv, blurr=cfg.blurr,
                      dtype=cfg.dtype)
    if net in ("transolver_structured", "transolver"):
        if net == "transolver":
            return TransolverIrregular(
                space_dim=2, fun_dim=5, n_layers=cfg.n_layers,
                n_hidden=cfg.n_hidden, n_head=cfg.n_head,
                mlp_ratio=cfg.mlp_ratio, out_dim=max(1, c_o),
                slice_num=cfg.slice_num, dtype=cfg.dtype)
        return TransolverStructured2D(
            H=cfg.H, W=cfg.W, space_dim=2, fun_dim=5,
            n_layers=cfg.n_layers, n_hidden=cfg.n_hidden,
            n_head=cfg.n_head, mlp_ratio=cfg.mlp_ratio,
            out_dim=max(1, c_o), slice_num=cfg.slice_num,
            a_bound=cfg.a_bound, p_pred=cfg.p_pred, kernel=3,
            dtype=cfg.dtype)
    if net == "vit":
        from .vit import ViTField
        # patch size must divide the grid; fall back to a compatible one
        ph = 8 if cfg.H % 8 == 0 else 2
        pw = 8 if cfg.W % 8 == 0 else 2
        return ViTField(image_size=(cfg.H, cfg.W), patch_size=(ph, pw),
                        c_o=3 if cfg.p_pred else 2,
                        dim=cfg.n_hidden, depth=cfg.n_layers,
                        heads=cfg.n_head, mlp_dim=cfg.n_hidden * 2,
                        channels=c_i, p_pred=cfg.p_pred, dtype=cfg.dtype)
    raise ValueError(f"unknown network {net!r}")
