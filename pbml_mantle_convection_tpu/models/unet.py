"""U-Net coupled (u, v, p, T) surrogate.

TPU-native Flax redesign of the reference ``Unet``
(pytorch_networks_convae.py:1700-2070): encoder–decoder with channel
doubling per level, bicubic upsampling, the input pre-padded by (3, 3) in x
and the output cropped ``[..., 3:-3]``, predicting stream function *and*
temperature so one network advances the whole coupled time step.

Input: 11 channels (10 without p):
``(xc/4, yc/4, dt, raq_nd, fkt_nd, fkp_nd, log10(V)/8, T, u_prev, v_prev)``
(datasetio.py:258-274). Output ``(u, v, p|None, T)``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.curl import curl_head_padded, gaussian_blur_5x9
from ..ops.resize import avg_pool_nhwc, resize_bicubic_nhwc
from .layers import (
    BoundaryLearnedConvolution2D,
    Conv2dTorch,
    FluidLayer,
    GroupNormTorch,
    SpectralFluidLayer,
    get_activation,
    pad_nhwc,
)


class Unet(nn.Module):
    """See module docstring. ``levels`` must be ≥ 2 (the reference decoder
    assumes it, pytorch_networks_convae.py:2006-2014)."""

    levels: int
    c_i: int
    c_h: int
    c_o: int
    act_fn: str = "gelu"
    r_p: str = "replicate"
    loss_type: str = "curl"
    use_symm: bool = False
    dilation: int = 1
    a_bound: float = 10.0
    repeats: int = 2
    f: int = 5
    p_pred: bool = False
    spectral_conv: bool = False
    blurr: bool = False
    drop_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    def _layer(self, features, name, bc_x=1, bc_y=1):
        if self.spectral_conv:
            return SpectralFluidLayer(features, self.act_fn,
                                      dtype=self.dtype, name=name)
        return FluidLayer(
            features, act_fn=self.act_fn, r_p=self.r_p,
            use_symm=self.use_symm, dilation=self.dilation,
            kernel_size=self.f, drop_rate=self.drop_rate,
            bc_x=bc_x, bc_y=bc_y, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        assert self.levels >= 2, "Unet requires levels >= 2"
        learned = self.r_p == "learned"
        pad_mode = "constant" if self.r_p == "zeros" else self.r_p

        x = inputs
        if not learned:
            # pad (3,3,0,0) in x (pytorch_networks_convae.py:1990-1991)
            x = pad_nhwc(x, (0, 0), (3, 3), pad_mode)

        # Level-0 stack. With learned padding, the first layer grows W by 6
        # via bc_x=4 (pytorch_networks_convae.py:1994-1995).
        for r in range(self.repeats):
            bc_x = 4 if (learned and r == 0) else 1
            x = self._layer(self.c_h, f"conv_{r}", bc_x=bc_x)(
                x, deterministic=deterministic)

        feats = [x]
        sizes = [(x.shape[1], x.shape[2])]
        ch = self.c_h
        for l in range(1, self.levels):
            x = avg_pool_nhwc(x, 2)
            sizes.append((x.shape[1], x.shape[2]))
            for r in range(self.repeats):
                x = self._layer(ch, f"convs_{l - 1}_{r}")(
                    x, deterministic=deterministic)
            feats.append(x)
            ch *= 2
        ch //= 2  # deepest channel count

        # Decoder (pytorch_networks_convae.py:2008-2012).
        xu = feats[self.levels - 1]
        for i, l in enumerate(range(self.levels - 2, 0, -1)):
            xu = resize_bicubic_nhwc(xu, sizes[l])
            xu = jnp.concatenate((feats[l], xu), axis=-1)
            for r in range(self.repeats):
                xu = self._layer(ch // 2, f"upconvs_{i}_{r}")(
                    xu, deterministic=deterministic)
            ch //= 2

        xu = resize_bicubic_nhwc(xu, sizes[0])
        y = jnp.concatenate((xu, feats[0]), axis=-1)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_m3")(y)
        else:
            y = Conv2dTorch(self.c_h, self.f, padding="SAME",
                            pad_mode=pad_mode, dilation=self.dilation,
                            dtype=self.dtype, name="conv_m3")(y)
        y = GroupNormTorch(max(1, self.c_h // 4), dtype=self.dtype,
                           name="gn_0")(y)
        act = get_activation(self.act_fn)
        y = act(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_h, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_m2")(y)
        else:
            y = Conv2dTorch(self.c_h, self.f, padding="SAME",
                            pad_mode=pad_mode, dtype=self.dtype,
                            name="conv_m2")(y)
        y = act(y)

        if learned:
            y = BoundaryLearnedConvolution2D(
                self.c_o, self.f, use_symm=self.use_symm, dtype=self.dtype,
                name="conv_m1")(y)
        else:
            y = Conv2dTorch(self.c_o, self.f, padding="SAME",
                            pad_mode=pad_mode, dtype=self.dtype,
                            name="conv_m1")(y)

        # Mean-subtract on the padded field, then crop the 3-col pads
        # (pytorch_networks_convae.py:2024).
        y = (y - jnp.mean(y, axis=(1, 2), keepdims=True))[:, :, 3:-3, :]

        if self.loss_type in ("mae", "mass"):
            u = y[..., 0]
            v = y[..., 1]
            T = y[..., 2]
            p = y[..., 3] if self.p_pred else None
            return u, v, p, T

        # curl head (pytorch_networks_convae.py:2038-2068)
        a = y[..., 0] * self.a_bound
        if self.blurr:
            a = gaussian_blur_5x9(a)
        T = jnp.clip(y[..., 1], 0.0, 1.5)
        p = y[..., 2] if self.p_pred else None
        u, v = curl_head_padded(a)
        return u, v, p, T


class ConvAE(nn.Module):
    """Convolutional autoencoder Stokes surrogate (checkpoint-only model).

    Reference: pycold-checkpoint.py:989-1114 — stem FluidLayer, ``levels`` ×
    (AvgPool(4) + ``repeats`` FluidLayers quadrupling channels), a mid
    stack, then the mirrored bicubic-upsample decoder, final conv with
    (2, 2) padding under curl, and a curl head whose u/v are concatenated
    with the interior-cropped remaining channels.

    Deviation: the reference decoder uses ``Upsample(scale_factor=4)``,
    which cannot reproduce non-multiple-of-4 widths (e.g. 506); we upsample
    to the recorded encoder sizes instead. On ×4-divisible grids this is
    numerically identical to the reference's scale_factor-4 upsample
    (both use the half-pixel convention;
    tests/test_resize.py::test_bicubic_scale_factor4_exact), so the
    generalization is a strict superset, not a numeric deviation.
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
    dtype: Optional[jnp.dtype] = None

    def _layer(self, features, name):
        if self.spectral_conv:
            return SpectralFluidLayer(features, self.act_fn,
                                      dtype=self.dtype, name=name)
        return FluidLayer(
            features, act_fn=self.act_fn, r_p=self.r_p,
            use_symm=self.use_symm, dilation=self.dilation,
            kernel_size=self.f, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        factor = 4
        pad_mode = "constant" if self.r_p == "zeros" else self.r_p

        x = self._layer(self.c_h, "stem")(inputs, deterministic=deterministic)

        ch = self.c_h
        sizes = [(x.shape[1], x.shape[2])]
        for l in range(self.levels):
            x = avg_pool_nhwc(x, factor)
            sizes.append((x.shape[1], x.shape[2]))
            for r in range(self.repeats):
                x = self._layer(ch * factor, f"enc_{l}_{r}")(
                    x, deterministic=deterministic)
            ch *= factor

        ch //= factor
        for r in range(self.repeats):
            x = self._layer(ch, f"mid_{r}")(x, deterministic=deterministic)

        for i, l in enumerate(range(self.levels, 0, -1)):
            x = resize_bicubic_nhwc(x, sizes[l - 1])
            for r in range(self.repeats):
                x = self._layer(ch // factor, f"dec_{i}_{r}")(
                    x, deterministic=deterministic)
            ch //= factor

        pad = (2, 2) if self.loss_type == "curl" else (1, 1)
        x = Conv2dTorch(self.c_o, 3, pad_mode=pad_mode,
                        explicit_padding=pad, dtype=self.dtype,
                        name="out_conv")(x)

        if self.loss_type != "curl":
            return x

        # curl head on the last channel (pycold-checkpoint.py:1099-1114);
        # under curl the field is (H+2, W+2) and everything is cropped back.
        a = x[..., -1] * self.a_bound
        from ..ops.stencils import dx_center, dy_center  # local to avoid cycle
        u = dy_center(a)[..., :, 1:-1]
        v = -dx_center(a)[..., 1:-1, :]
        inner = x[:, 1:-1, 1:-1, :]
        if self.p_pred:
            out = jnp.concatenate(
                (inner[..., :-2], u[..., None], v[..., None],
                 inner[..., -2:-1]), axis=-1)
        else:
            out = jnp.concatenate(
                (inner[..., :-1], u[..., None], v[..., None]), axis=-1)
        return out
