"""FluidNet-family Stokes surrogates (multi-scale parallel-branch CNNs).

TPU-native Flax redesign of the reference's primary surrogate
(``NewFluidNet`` pytorch_networks_convae.py:1068-1388, ``FluidNet``
:1392-1697). Tensors are NHWC; bicubic upsampling is implemented as MXU
matmuls (ops/resize.py); the curl heads are shared functions
(ops/curl.py).

Inputs (fluidnet family): 7 channels
``(xc/4, yc/4, log10(V)/8, raq_nd, fkt_nd, fkp_nd, T)``
(datasetio.py:630-641). Outputs ``(u, v, p|None)`` with u, v of shape
(B, H, W).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.curl import blur3x3, curl_head_cropped, curl_head_padded
from ..ops.resize import avg_pool_nhwc, resize_bicubic_nhwc
from .layers import (
    BoundaryLearnedConvolution2D,
    Conv2dTorch,
    FluidLayer,
    GroupNormTorch,
    SpectralFluidLayer,
    get_activation,
)


def _fluid_layer(features, act_fn, r_p, use_symm, dilation, f, drop_rate,
                 spectral, dtype, name):
    if spectral:
        return SpectralFluidLayer(features, act_fn, dtype=dtype, name=name)
    return FluidLayer(
        features, act_fn=act_fn, r_p=r_p, use_symm=use_symm,
        dilation=dilation, kernel_size=f, drop_rate=drop_rate,
        dtype=dtype, name=name)


class NewFluidNet(nn.Module):
    """Multi-scale parallel-branch CNN with a curl (stream-function) head.

    Architecture (reference: pytorch_networks_convae.py:1315-1388):
    stem FluidLayer → ``levels`` parallel branches (branch *l* avg-pools
    *l* times by ``factor``, runs ``repeats`` FluidLayers, bicubic-upsamples
    back) → concat all branches + input skip → merge conv + GN + act →
    conv + act → out conv → subtract spatial mean → head.
    """

    levels: int
    c_i: int
    c_h: int
    c_o: int
    act_fn: str = "selu"
    r_p: str = "zeros"
    loss_type: str = "mae"  # "mae" | "mass" | "curl"
    use_symm: bool = False
    dilation: int = 1
    a_bound: float = 4.0
    repeats: int = 3
    f: int = 3
    p_pred: bool = True
    spectral_conv: bool = False
    blurr: bool = False
    drop_rate: float = 0.0
    factor: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        # inputs: (B, H, W, c_i)
        B, H, W, _ = inputs.shape
        learned = self.r_p == "learned"
        pad_mode = "constant" if self.r_p == "zeros" else self.r_p

        if learned:
            # eager config check: the learned-padding BLC stitch slices
            # slabs of width k+1 (k==5) from each edge; a branch pooled
            # below that collapses to an empty VALID conv and fails with
            # an opaque 0-size resize deep in the trace (the torch
            # reference errors the same way at such sizes).
            slab = self.f + 1 if self.f == 5 else self.f
            hd = H // self.factor ** (self.levels - 1)
            wd = W // self.factor ** (self.levels - 1)
            if min(hd, wd) < slab:
                raise ValueError(
                    f"NewFluidNet: levels={self.levels} pools the deepest "
                    f"branch of a {H}x{W} grid to {hd}x{wd}, below the "
                    f"{slab}x{slab} minimum of the learned-padding k="
                    f"{self.f} layers — reduce levels or enlarge the grid")

        x_in = _fluid_layer(
            self.c_h, self.act_fn, self.r_p, self.use_symm, self.dilation,
            self.f, self.drop_rate, self.spectral_conv, self.dtype,
            name="conv_0")(inputs, deterministic=deterministic)

        branches = []
        for l in range(self.levels):
            y1 = x_in
            for _ in range(l):
                y1 = avg_pool_nhwc(y1, self.factor)
            for r in range(self.repeats):
                y1 = _fluid_layer(
                    self.c_h, self.act_fn, self.r_p, self.use_symm,
                    self.dilation, self.f, self.drop_rate,
                    self.spectral_conv, self.dtype,
                    name=f"convs_{l}_{r}")(y1, deterministic=deterministic)
            if l > 0:
                y1 = resize_bicubic_nhwc(y1, (H, W))
            branches.append(y1)

        y = jnp.concatenate(branches + [inputs], axis=-1)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_1")(y)
        else:
            y = Conv2dTorch(
                self.c_h, 3, pad_mode=pad_mode, dilation=self.dilation,
                explicit_padding=(1, 1), dtype=self.dtype, name="conv_1")(y)
        y = GroupNormTorch(max(1, self.c_h // 4), dtype=self.dtype,
                           name="gn_0")(y)
        act = get_activation(self.act_fn)
        y = act(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_2")(y)
        else:
            y = Conv2dTorch(self.c_h, 3, pad_mode=pad_mode,
                            explicit_padding=(1, 1), dtype=self.dtype,
                            name="conv_2")(y)
        y = act(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_o, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_3")(y)
        else:
            y = Conv2dTorch(self.c_o, 3, pad_mode=pad_mode,
                            explicit_padding=(1, 1), dtype=self.dtype,
                            name="conv_3")(y)

        y = y - jnp.mean(y, axis=(1, 2), keepdims=True)

        if self.loss_type in ("mae", "mass"):
            u = y[..., 0]
            v = y[..., 1]
            p = y[..., 2] if self.p_pred else None
            return u, v, p

        # curl head (pytorch_networks_convae.py:1356-1388)
        a = y[..., 0] * self.a_bound
        if self.blurr:
            a = blur3x3(a)
        p = y[..., 1] if self.p_pred else None
        u, v = curl_head_padded(a)
        return u, v, p


class FluidNet(nn.Module):
    """Older FluidNet variant. Same topology as :class:`NewFluidNet` with
    three load-bearing differences (reference:
    pytorch_networks_convae.py:1392-1697):

    * under ``loss_type="curl"`` the merge conv grows the field to
      (H+2, W+2) — padding (2,2) for plain convs (:1580-1583), bc_x=bc_y=2
      for learned padding (:1659-1660);
    * the curl head *crops* back to (H, W) instead of re-padding and
      stamping BCs (:1694-1697);
    * otherwise identical.
    """

    levels: int
    c_i: int
    c_h: int
    c_o: int
    act_fn: str = "selu"
    r_p: str = "zeros"
    loss_type: str = "mae"
    use_symm: bool = False
    dilation: int = 1
    a_bound: float = 4.0
    repeats: int = 3
    f: int = 3
    p_pred: bool = True
    spectral_conv: bool = False
    blurr: bool = False
    drop_rate: float = 0.0
    factor: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        B, H, W, _ = inputs.shape
        learned = self.r_p == "learned"
        pad_mode = "constant" if self.r_p == "zeros" else self.r_p
        curl = self.loss_type == "curl"

        x_in = _fluid_layer(
            self.c_h, self.act_fn, self.r_p, self.use_symm, self.dilation,
            self.f, self.drop_rate, self.spectral_conv, self.dtype,
            name="conv_0")(inputs, deterministic=deterministic)

        branches = []
        for l in range(self.levels):
            y1 = x_in
            for _ in range(l):
                y1 = avg_pool_nhwc(y1, self.factor)
            for r in range(self.repeats):
                y1 = _fluid_layer(
                    self.c_h, self.act_fn, self.r_p, self.use_symm,
                    self.dilation, self.f, self.drop_rate,
                    self.spectral_conv, self.dtype,
                    name=f"convs_{l}_{r}")(y1, deterministic=deterministic)
            if l > 0:
                y1 = resize_bicubic_nhwc(y1, (H, W))
            branches.append(y1)

        y = jnp.concatenate(branches + [inputs], axis=-1)

        if learned:
            # bc_x=2, bc_y=2 grows the field by 2 (reference :1659-1660).
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm,
                bc_x=2 if curl else 1, bc_y=2 if curl else 1,
                dtype=self.dtype, name="conv_1")(y)
        else:
            pad = (2, 2) if curl else (1, 1)
            y = Conv2dTorch(
                self.c_h, 3, pad_mode=pad_mode, dilation=self.dilation,
                explicit_padding=pad, dtype=self.dtype, name="conv_1")(y)
        y = GroupNormTorch(max(1, self.c_h // 4), dtype=self.dtype,
                           name="gn_0")(y)
        act = get_activation(self.act_fn)
        y = act(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_2")(y)
        else:
            y = Conv2dTorch(self.c_h, 3, pad_mode=pad_mode,
                            explicit_padding=(1, 1), dtype=self.dtype,
                            name="conv_2")(y)
        y = act(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_o, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_3")(y)
        else:
            y = Conv2dTorch(self.c_o, 3, pad_mode=pad_mode,
                            explicit_padding=(1, 1), dtype=self.dtype,
                            name="conv_3")(y)

        y = y - jnp.mean(y, axis=(1, 2), keepdims=True)

        if self.loss_type in ("mae", "mass"):
            u = y[..., 0]
            v = y[..., 1]
            p = y[..., 2] if self.p_pred else None
            return u, v, p

        a = y[..., 0] * self.a_bound
        if self.blurr:
            a = blur3x3(a)
        p = y[..., 1] if self.p_pred else None
        u, v = curl_head_cropped(a)
        return u, v, p


class HalfNewFluidNet(nn.Module):
    """Lighter NewFluidNet trunk used as the per-scale member of
    :class:`MultiScaleNewFluidNet`.

    NOTE: the original class is *lost* in the reference — it is invoked from
    ``multigpu.py:540`` and ``load_fluidnet.ipynb`` but defined nowhere in
    the surviving sources (see SURVEY.md §2, "dangling references"). This is
    a documented functional reconstruction: a NewFluidNet without the middle
    merge conv ("half" the merge stack), returning the raw c_o head so the
    ensemble wrapper can combine members before the curl head.
    """

    levels: int
    c_i: int
    c_h: int
    c_o: int
    act_fn: str = "selu"
    r_p: str = "zeros"
    loss_type: str = "mae"
    use_symm: bool = False
    dilation: int = 1
    a_bound: float = 4.0
    repeats: int = 3
    f: int = 3
    p_pred: bool = True
    spectral_conv: bool = False
    blurr: bool = False
    drop_rate: float = 0.0
    factor: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        B, H, W, _ = inputs.shape
        learned = self.r_p == "learned"
        pad_mode = "constant" if self.r_p == "zeros" else self.r_p

        x_in = _fluid_layer(
            self.c_h, self.act_fn, self.r_p, self.use_symm, self.dilation,
            self.f, self.drop_rate, self.spectral_conv, self.dtype,
            name="conv_0")(inputs, deterministic=deterministic)

        branches = []
        for l in range(self.levels):
            y1 = x_in
            for _ in range(l):
                y1 = avg_pool_nhwc(y1, self.factor)
            for r in range(self.repeats):
                y1 = _fluid_layer(
                    self.c_h, self.act_fn, self.r_p, self.use_symm,
                    self.dilation, self.f, self.drop_rate,
                    self.spectral_conv, self.dtype,
                    name=f"convs_{l}_{r}")(y1, deterministic=deterministic)
            if l > 0:
                y1 = resize_bicubic_nhwc(y1, (H, W))
            branches.append(y1)

        y = jnp.concatenate(branches + [inputs], axis=-1)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_1")(y)
        else:
            y = Conv2dTorch(self.c_h, 3, pad_mode=pad_mode,
                            explicit_padding=(1, 1), dtype=self.dtype,
                            name="conv_1")(y)
        y = GroupNormTorch(max(1, self.c_h // 4), dtype=self.dtype,
                           name="gn_0")(y)
        y = get_activation(self.act_fn)(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_o, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_3")(y)
        else:
            y = Conv2dTorch(self.c_o, 3, pad_mode=pad_mode,
                            explicit_padding=(1, 1), dtype=self.dtype,
                            name="conv_3")(y)
        return y - jnp.mean(y, axis=(1, 2), keepdims=True)


class MultiScaleNewFluidNet(nn.Module):
    """Ensemble of :class:`HalfNewFluidNet` members over viscosity scales.

    Reconstruction of the lost reference class (multigpu.py:562,
    load_fluidnet.ipynb cell 7: "multi-scale ensemble over viscosity scales
    [1e-5 … 1e+1]"). Each member sees the 7-channel input with its viscosity
    channel re-referenced to one scale; member raw heads are blended with a
    softmax gate over the distance between the local log-viscosity and each
    member's scale, and the blended field goes through the standard head.

    Input viscosity channel is index 2 (log10(V)/8, datasetio.py:630-641).
    """

    levels: int
    c_i: int
    c_h: int
    c_o: int
    scales: Sequence[float] = (1e-5, 1e-3, 1e-1, 1e1)
    act_fn: str = "selu"
    r_p: str = "zeros"
    loss_type: str = "curl"
    use_symm: bool = False
    dilation: int = 1
    a_bound: float = 4.0
    repeats: int = 3
    f: int = 3
    p_pred: bool = False
    spectral_conv: bool = False
    blurr: bool = False
    drop_rate: float = 0.0
    factor: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        log_v = inputs[..., 2] * 8.0  # undo the /8 featurization
        heads = []
        gates = []
        for i, s in enumerate(self.scales):
            log_s = jnp.log10(jnp.asarray(s, dtype=inputs.dtype))
            # member-centred viscosity feature
            x_i = inputs.at[..., 2].set((log_v - log_s) / 8.0)
            h = HalfNewFluidNet(
                self.levels, self.c_i, self.c_h, self.c_o,
                act_fn=self.act_fn, r_p=self.r_p, loss_type=self.loss_type,
                use_symm=self.use_symm, dilation=self.dilation,
                a_bound=self.a_bound, repeats=self.repeats, f=self.f,
                p_pred=self.p_pred, spectral_conv=self.spectral_conv,
                blurr=self.blurr, drop_rate=self.drop_rate,
                factor=self.factor, dtype=self.dtype,
                name=f"nets_{i}")(inputs=x_i, deterministic=deterministic)
            heads.append(h)
            gates.append(-jnp.abs(log_v - log_s))

        gate = jnp.stack(gates, axis=-1)          # (B, H, W, S)
        gate = nn.softmax(gate, axis=-1)
        y = sum(h * gate[..., i:i + 1] for i, h in enumerate(heads))
        y = y - jnp.mean(y, axis=(1, 2), keepdims=True)

        if self.loss_type in ("mae", "mass"):
            u = y[..., 0]
            v = y[..., 1]
            p = y[..., 2] if self.p_pred else None
            return u, v, p

        a = y[..., 0] * self.a_bound
        if self.blurr:
            a = blur3x3(a)
        p = y[..., 1] if self.p_pred else None
        u, v = curl_head_padded(a)
        return u, v, p
