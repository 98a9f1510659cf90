"""PyTorch → Flax checkpoint conversion.

Maps the reference's ``state_dict`` checkpoints
(``{epoch}_fluidnet_uvp.pt``, multigpu.py:412-419) onto this framework's
parameter pytrees so trained reference networks can be rolled out here and
results are numerically comparable (SURVEY.md §5, checkpoint/resume).

Name mapping (reference module tree → our Flax tree):

NewFluidNet / FluidNet (pytorch_networks_convae.py:1068-1697):
  conv.0.layers.0.*      → conv_0/conv/*        (FluidLayer conv or BLC)
  conv.0.layers.1.*      → conv_0/gn/GroupNorm_0/*
  convs.{l}.{r}.layers.* → convs_{l}_{r}/...
  conv.1|2|3.*           → conv_1|2|3/*
  gn.0.*                 → gn_0/GroupNorm_0/*

Unet (pytorch_networks_convae.py:1700-2070):
  conv.{r<repeats}       → conv_{r};  convs.{l}.{r} → convs_{l}_{r}
  upconvs.{i}.{r}        → upconvs_{i}_{r}
  conv.{-3,-2,-1}        → conv_m3, conv_m2, conv_m1;  gn.0 → gn_0

Tensor layout: conv weights OIHW → HWIO; linear weights (out,in) →
(in,out); GroupNorm weight/bias → scale/bias; BLC learnable_bias
(1,C,1,1) → (1,1,1,C); SpectralConv complex weights → *_real/_imag.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv_w(t):
    return np.asarray(t).transpose(2, 3, 1, 0)  # OIHW → HWIO


_BLC_SUBMODULES = (
    "conv", "conv_top_left", "conv_top_right", "conv_bottom_left",
    "conv_bottom_right", "conv_top", "conv_bottom", "conv_left",
    "conv_right")


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_layer(out: Dict, prefix_out, torch_params: Mapping,
                   prefix_in: str):
    """Convert one conv-ish reference submodule (plain conv, symmetric
    conv, BLC, spectral conv) living at ``prefix_in`` in the state_dict."""
    keys = [k for k in torch_params if k.startswith(prefix_in)]
    rels = {k[len(prefix_in):].lstrip("."): k for k in keys}

    if "learnable_bias" in rels:  # BoundaryLearnedConvolution2D
        for sub in _BLC_SUBMODULES:
            wk = f"{sub}.weight"
            if wk in rels:
                _set(out, prefix_out + (sub, "kernel"),
                     _conv_w(torch_params[rels[wk]]))
        lb = np.asarray(torch_params[rels["learnable_bias"]])
        _set(out, prefix_out + ("learnable_bias",),
             lb.transpose(0, 2, 3, 1))
        return

    if "weights1" in rels:  # SpectralConv2d
        for i in (1, 2):
            w = np.asarray(torch_params[rels[f"weights{i}"]])
            _set(out, prefix_out + (f"weights{i}_real",), w.real)
            _set(out, prefix_out + (f"weights{i}_imag",), w.imag)
        return

    if "weight" in rels:  # plain / symmetric conv
        _set(out, prefix_out + ("kernel",),
             _conv_w(torch_params[rels["weight"]]))
        if "bias" in rels:
            _set(out, prefix_out + ("bias",),
                 np.asarray(torch_params[rels["bias"]]))


def _convert_gn(out: Dict, prefix_out, torch_params: Mapping,
                prefix_in: str):
    _set(out, prefix_out + ("GroupNorm_0", "scale"),
         np.asarray(torch_params[prefix_in + ".weight"]))
    _set(out, prefix_out + ("GroupNorm_0", "bias"),
         np.asarray(torch_params[prefix_in + ".bias"]))


def _convert_fluid_layer(out: Dict, name_out: str, sd: Mapping,
                         prefix_in: str):
    """FluidLayer: layers.0 = conv, layers.1 = GroupNorm
    (pytorch_networks_convae.py:759-788)."""
    _convert_layer(out, (name_out, "conv"), sd, prefix_in + ".layers.0")
    _convert_gn(out, (name_out, "gn"), sd, prefix_in + ".layers.1")


def convert_fluidnet(state_dict: Mapping, levels: int, repeats: int
                     ) -> Dict:
    """NewFluidNet / FluidNet state_dict → Flax params dict."""
    sd = {k: v for k, v in state_dict.items()}
    out: Dict = {}
    _convert_fluid_layer(out, "conv_0", sd, "conv.0")
    for l in range(levels):
        for r in range(repeats):
            _convert_fluid_layer(out, f"convs_{l}_{r}", sd,
                                 f"convs.{l}.{r}")
    _convert_layer(out, ("conv_1",), sd, "conv.1")
    _convert_gn(out, ("gn_0",), sd, "gn.0")
    _convert_layer(out, ("conv_2",), sd, "conv.2")
    _convert_layer(out, ("conv_3",), sd, "conv.3")
    return {"params": out}


def convert_unet(state_dict: Mapping, levels: int, repeats: int) -> Dict:
    """Unet state_dict → Flax params dict."""
    sd = {k: v for k, v in state_dict.items()}
    out: Dict = {}
    for r in range(repeats):
        _convert_fluid_layer(out, f"conv_{r}", sd, f"conv.{r}")
    for l in range(1, levels):
        for r in range(repeats):
            _convert_fluid_layer(out, f"convs_{l - 1}_{r}", sd,
                                 f"convs.{l - 1}.{r}")
    n_up = max(0, levels - 2)
    for i in range(n_up):
        for r in range(repeats):
            _convert_fluid_layer(out, f"upconvs_{i}_{r}", sd,
                                 f"upconvs.{i}.{r}")
    _convert_layer(out, ("conv_m3",), sd, f"conv.{repeats}")
    _convert_gn(out, ("gn_0",), sd, "gn.0")
    _convert_layer(out, ("conv_m2",), sd, f"conv.{repeats + 1}")
    _convert_layer(out, ("conv_m1",), sd, f"conv.{repeats + 2}")
    return {"params": out}


def load_reference_checkpoint(path: str, network: str, levels: int,
                              repeats: int) -> Dict:
    """Load a reference ``.pt`` checkpoint and convert it."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    if network in ("unet", "iunet"):
        return convert_unet(sd, levels, repeats)
    return convert_fluidnet(sd, levels, repeats)
