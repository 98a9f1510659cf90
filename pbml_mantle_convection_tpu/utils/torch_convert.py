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


def _lin_w(t):
    return np.asarray(t).T                  # torch (out, in) → (in, out)


def convert_transolver(state_dict: Mapping, n_layers: int) -> Dict:
    """Transolver ``Model`` state_dict → TransolverStructured2D /
    TransolverIrregular params.

    Covers both mesh variants: the structured model's conv slice
    projections (Physics_Attention-checkpoint.py:75-77, OIHW→HWIO) and
    the irregular model's Linear ones (:18-19, transposed); shared
    block layout per Transolver_Structured_Mesh_2D-checkpoint.py:41-77
    (ln_1/Attn/ln_2/mlp, ln_3+mlp2 on the last block).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}

    def lin(dst, src, bias=True):
        _set(out, dst + ("kernel",), _lin_w(sd[src + ".weight"]))
        if bias:
            _set(out, dst + ("bias",), sd[src + ".bias"])

    def ln(dst, src):
        _set(out, dst + ("scale",), sd[src + ".weight"])
        _set(out, dst + ("bias",), sd[src + ".bias"])

    lin(("preprocess", "linear_pre"), "preprocess.linear_pre.0")
    lin(("preprocess", "linear_post"), "preprocess.linear_post")
    if "placeholder" in sd:
        out["placeholder"] = sd["placeholder"]
    for i in range(n_layers):
        b = f"blocks.{i}"
        d = (f"blocks_{i}",)
        ln(d + ("ln_1",), f"{b}.ln_1")
        ln(d + ("ln_2",), f"{b}.ln_2")
        _set(out, d + ("Attn", "temperature"),
             sd[f"{b}.Attn.temperature"])
        if sd[f"{b}.Attn.in_project_x.weight"].ndim == 4:
            for nm in ("in_project_x", "in_project_fx"):
                _set(out, d + ("Attn", nm, "kernel"),
                     _conv_w(sd[f"{b}.Attn.{nm}.weight"]))
                _set(out, d + ("Attn", nm, "bias"),
                     sd[f"{b}.Attn.{nm}.bias"])
        else:
            lin(d + ("Attn", "in_project_x"), f"{b}.Attn.in_project_x")
            lin(d + ("Attn", "in_project_fx"),
                f"{b}.Attn.in_project_fx")
        lin(d + ("Attn", "in_project_slice"),
            f"{b}.Attn.in_project_slice")
        for nm in ("to_q", "to_k", "to_v"):
            lin(d + ("Attn", nm), f"{b}.Attn.{nm}", bias=False)
        lin(d + ("Attn", "to_out"), f"{b}.Attn.to_out.0")
        lin(d + ("mlp", "linear_pre"), f"{b}.mlp.linear_pre.0")
        lin(d + ("mlp", "linear_post"), f"{b}.mlp.linear_post")
        if f"{b}.ln_3.weight" in sd:
            ln(d + ("ln_3",), f"{b}.ln_3")
            lin(d + ("mlp2",), f"{b}.mlp2")
    return {"params": out}


def convert_vit(state_dict: Mapping, depth: int,
                prefix_out: tuple = ()) -> Dict:
    """lucidrains ViT state_dict → models/vit.ViT params
    (vit_pytorch-checkpoint.py:85-133). ``prefix_out`` nests the tree
    (e.g. ("vit",) for ViTField's inner module)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict = {}
    p = prefix_out

    def lin(dst, src, bias=True):
        _set(out, dst + ("kernel",), _lin_w(sd[src + ".weight"]))
        if bias:
            _set(out, dst + ("bias",), sd[src + ".bias"])

    def ln(dst, src):
        _set(out, dst + ("scale",), sd[src + ".weight"])
        _set(out, dst + ("bias",), sd[src + ".bias"])

    ln(p + ("LayerNorm_0",), "to_patch_embedding.1")
    lin(p + ("Dense_0",), "to_patch_embedding.2")
    ln(p + ("LayerNorm_1",), "to_patch_embedding.3")
    _set(out, p + ("pos_embedding",), sd["pos_embedding"])
    _set(out, p + ("cls_token",), sd["cls_token"])
    t = p + ("Transformer_0",)
    for i in range(depth):
        a = f"transformer.layers.{i}.0"
        f = f"transformer.layers.{i}.1"
        ln(t + (f"attn_{i}", "LayerNorm_0"), f"{a}.norm")
        lin(t + (f"attn_{i}", "Dense_0"), f"{a}.to_qkv", bias=False)
        lin(t + (f"attn_{i}", "Dense_1"), f"{a}.to_out.0")
        ln(t + (f"ff_{i}", "LayerNorm_0"), f"{f}.net.0")
        lin(t + (f"ff_{i}", "Dense_0"), f"{f}.net.1")
        lin(t + (f"ff_{i}", "Dense_1"), f"{f}.net.4")
    ln(t + ("LayerNorm_0",), "transformer.norm")
    lin(p + ("Dense_1",), "mlp_head")
    return {"params": out}


def load_reference_checkpoint(path: str, network: str, levels: int,
                              repeats: int) -> Dict:
    """Load a reference ``.pt`` checkpoint and convert it."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    if network in ("unet", "iunet"):
        return convert_unet(sd, levels, repeats)
    if "transolver" in network:
        return convert_transolver(sd, levels)
    return convert_fluidnet(sd, levels, repeats)
