"""Core neural layers: symmetric convs, boundary-learned convs, FluidLayer,
spectral (FNO) convs.

TPU-native Flax/linen redesign of the reference's layer library
(symmetric_layers_torch.py, pytorch_networks_convae.py:571-1065). All
tensors are NHWC (channels-last) — the layout XLA:TPU prefers for
convolutions — and kernels are HWIO.

Initialization reproduces torch's Conv2d defaults (Kaiming-uniform with
a=√5 ⇒ U(-1/√fan_in, 1/√fan_in) for both weight and bias) so training
dynamics are comparable with the reference.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


# ---------------------------------------------------------------------------
# Activations (reference: pytorch_networks_convae.py:672-686 etc.)
# ---------------------------------------------------------------------------


def sine30(x):
    """SIREN-style activation sin(30 x) (reference ``Sine(30.)``)."""
    return jnp.sin(30.0 * x)


_ACTIVATIONS = {
    "selu": jax.nn.selu,
    "sine": sine30,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    # torch nn.GELU() defaults to the exact (erf) form.
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; "
                         f"options: {sorted(_ACTIVATIONS)}")


# ---------------------------------------------------------------------------
# Initializers matching torch Conv2d/Linear defaults.
# ---------------------------------------------------------------------------


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """HWIO kernel ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)), fan_in = kh*kw*Cin."""
    kh, kw, cin, _ = shape
    bound = 1.0 / math.sqrt(kh * kw * cin)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """(in, out) kernel ~ U(-1/sqrt(in), 1/sqrt(in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Padding + conv helpers.
# ---------------------------------------------------------------------------

_PAD_MODES = {
    "constant": "constant",
    "zeros": "constant",
    "replicate": "edge",
    "reflect": "reflect",
    "circular": "wrap",
}


def pad_nhwc(x, pad_h, pad_w, mode: str):
    """Pad the H and W axes of an NHWC tensor with a torch padding_mode."""
    jmode = _PAD_MODES[mode]
    cfg = ((0, 0), pad_h, pad_w, (0, 0))
    if jmode == "constant":
        return jnp.pad(x, cfg)
    return jnp.pad(x, cfg, mode=jmode)


def conv2d_nhwc(x, kernel, bias=None, *, padding="VALID", dilation=1):
    """lax conv wrapper: NHWC input, HWIO kernel."""
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias
    return y


def default_symmetry(c_o: int) -> dict:
    """The symmetry split used throughout the reference:
    h = c_o/4 (c_o/2 when c_o ≤ 4), v = 0, hv = 0
    (pytorch_networks_convae.py:755-757, 852-854)."""
    h = c_o // 4 if c_o > 4 else c_o // 2
    return {"h": h, "v": 0, "hv": 0}


class SymmetricConv2d(nn.Module):
    """Conv2d with weight sharing between reflection-symmetric filter groups.

    Stores only the unique filters; the mirrored counterparts are
    materialized with flips at call time, exactly as the reference
    (symmetric_layers_torch.py:21-138). ``symmetry`` counts output filters
    that come in horizontally-mirrored pairs ('h': flip along kernel W),
    vertically-mirrored pairs ('v': flip along kernel H), and quadruples
    ('hv'). Unique weight layout (and flip order) matches the reference so
    checkpoints map 1:1.

    Kernel param shape: (kh, kw, c_i, unique_out).
    """

    features: int
    kernel_size: int
    symmetry: Optional[dict] = None
    use_bias: bool = True
    padding: str = "VALID"  # "VALID" | "SAME" handled by caller via pad mode
    pad_mode: str = "constant"
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @staticmethod
    def unique_out_channels(features: int, symmetry: dict) -> int:
        s = {"h": 0, "v": 0, "hv": 0, **(symmetry or {})}
        for key in ("h", "v"):
            if s[key] % 2 != 0:
                raise ValueError("h/v symmetric filter counts must be even")
        if s["hv"] % 4 != 0:
            raise ValueError("hv symmetric filter count must be divisible by 4")
        if s["h"] + s["v"] + s["hv"] > features:
            raise ValueError("symmetric channels exceed out channels")
        return features - s["h"] // 2 - s["v"] // 2 - 3 * s["hv"] // 4

    @nn.compact
    def __call__(self, x):
        s = {"h": 0, "v": 0, "hv": 0, **(self.symmetry or {})}
        c_i = x.shape[-1]
        k = self.kernel_size
        n_unique = self.unique_out_channels(self.features, s)

        w = self.param(
            "kernel",
            torch_conv_kernel_init,
            (k, k, c_i, n_unique),
            self.dtype or x.dtype,
        )

        # Materialize mirrored filters. Kernel axes: (H, W, I, O); the
        # reference flips torch dim 3 (kernel W → our axis 1) for 'h' and
        # dim 2 (kernel H → our axis 0) for 'v'
        # (symmetric_layers_torch.py:119-137).
        parts = [w]
        ix = 0
        if s["h"] > 0:
            n = s["h"] // 2
            parts.append(jnp.flip(w[..., ix:ix + n], axis=1))
            ix += n
        if s["v"] > 0:
            n = s["v"] // 2
            parts.append(jnp.flip(w[..., ix:ix + n], axis=0))
            ix += n
        if s["hv"] > 0:
            n = s["hv"] // 4
            blk = w[..., ix:ix + n]
            parts.extend([
                jnp.flip(blk, axis=1),
                jnp.flip(blk, axis=0),
                jnp.flip(blk, axis=(0, 1)),
            ])
            ix += n
        kernel = jnp.concatenate(parts, axis=-1)

        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_conv_bias_init(k * k * c_i),
                (self.features,),
                self.dtype or x.dtype,
            )

        if self.padding == "SAME":
            total = self.dilation * (k - 1)
            ph = total // 2
            x = pad_nhwc(x, (ph, total - ph), (ph, total - ph),
                         self.pad_mode)
        return conv2d_nhwc(x, kernel, bias, padding="VALID",
                           dilation=self.dilation)


class SymmetricConv3d(nn.Module):
    """3-D symmetric convolution with weight sharing across reflection
    groups along h (kernel W), v (kernel H) and z (kernel D) axes and
    their combinations. Reference: symmetric_layers_torch.py:141-309.

    ``symmetry`` keys: 'h', 'v', 'z' (pairs), 'hv', 'hz', 'vz' (quads),
    'hvz' (octets). Kernel param: (kd, kh, kw, c_i, unique_out); NDHWC
    data. Flip-axis mapping from the torch reference (which flips dims
    4/3/2 of an OIDHW kernel): h → kernel W (axis 2), v → kernel H
    (axis 1), z → kernel D (axis 0).
    """

    features: int
    kernel_size: int
    symmetry: Optional[dict] = None
    use_bias: bool = True
    padding: str = "SAME"
    dtype: Optional[jnp.dtype] = None

    @staticmethod
    def unique_out_channels(features: int, symmetry: dict) -> int:
        s = {k: 0 for k in ("h", "v", "z", "hv", "hz", "vz", "hvz")}
        s.update(symmetry or {})
        for key, val in s.items():
            if key in ("h", "v", "z") and val % 2:
                raise ValueError("pair symmetries must be even")
            if key in ("hv", "hz", "vz") and val % 4:
                raise ValueError("quad symmetries must be divisible by 4")
            if key == "hvz" and val % 8:
                raise ValueError("hvz must be divisible by 8")
        if sum(s.values()) > features:
            raise ValueError("symmetric channels exceed out channels")
        return (features - s["h"] // 2 - s["v"] // 2 - s["z"] // 2
                - 3 * s["hv"] // 4 - 3 * s["hz"] // 4 - 3 * s["vz"] // 4
                - 7 * s["hvz"] // 8)

    @nn.compact
    def __call__(self, x):
        s = {k: 0 for k in ("h", "v", "z", "hv", "hz", "vz", "hvz")}
        s.update(self.symmetry or {})
        c_i = x.shape[-1]
        k = self.kernel_size
        n_unique = self.unique_out_channels(self.features, s)
        w = self.param("kernel", torch_conv_kernel_init_nd(3),
                       (k, k, k, c_i, n_unique), self.dtype or x.dtype)

        # flip-axis map (see class doc): h→2, v→1, z→0
        parts = [w]
        ix = 0
        for key, axes in (("h", (2,)), ("v", (1,)), ("z", (0,))):
            if s[key] > 0:
                n = s[key] // 2
                parts.append(jnp.flip(w[..., ix:ix + n], axis=axes))
                ix += n
        for key, ax2 in (("hv", (2, 1)), ("hz", (2, 0)), ("vz", (1, 0))):
            if s[key] > 0:
                n = s[key] // 4
                blk = w[..., ix:ix + n]
                parts.extend([jnp.flip(blk, axis=(ax2[0],)),
                              jnp.flip(blk, axis=(ax2[1],)),
                              jnp.flip(blk, axis=ax2)])
                ix += n
        if s["hvz"] > 0:
            n = s["hvz"] // 8
            blk = w[..., ix:ix + n]
            parts.extend([
                jnp.flip(blk, axis=(2,)), jnp.flip(blk, axis=(1,)),
                jnp.flip(blk, axis=(0,)), jnp.flip(blk, axis=(0, 1)),
                jnp.flip(blk, axis=(0, 2)), jnp.flip(blk, axis=(1, 2)),
                jnp.flip(blk, axis=(0, 1, 2))])
            ix += n
        kernel = jnp.concatenate(parts, axis=-1)

        bias = None
        if self.use_bias:
            bias = self.param("bias", torch_conv_bias_init(k ** 3 * c_i),
                              (self.features,), self.dtype or x.dtype)
        y = lax.conv_general_dilated(
            x, kernel, (1, 1, 1), self.padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)
        if bias is not None:
            y = y + bias
        return y


def torch_conv_kernel_init_nd(spatial_dims: int):
    def init(key, shape, dtype=jnp.float32):
        fan_in = math.prod(shape[:spatial_dims]) * shape[spatial_dims]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2dTorch(nn.Module):
    """Plain conv with torch-default init and torch padding_mode semantics."""

    features: int
    kernel_size: int
    use_bias: bool = True
    padding: str = "SAME"  # "SAME" | "VALID" | int pairs via explicit_padding
    pad_mode: str = "constant"
    dilation: int = 1
    explicit_padding: Optional[Sequence[int]] = None  # (ph, pw)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c_i = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_kernel_init,
            (k, k, c_i, self.features), self.dtype or x.dtype)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", torch_conv_bias_init(k * k * c_i),
                (self.features,), self.dtype or x.dtype)

        if self.explicit_padding is not None:
            ph, pw = self.explicit_padding
            x = pad_nhwc(x, (ph, ph), (pw, pw), self.pad_mode)
        elif self.padding == "SAME":
            total = self.dilation * (k - 1)
            ph = total // 2
            x = pad_nhwc(x, (ph, total - ph), (ph, total - ph),
                         self.pad_mode)
        return conv2d_nhwc(x, kernel, bias, padding="VALID",
                           dilation=self.dilation)


class BoundaryLearnedConvolution2D(nn.Module):
    """"Learned padding": 9 separate VALID convs — interior, 4 edges,
    4 corners — stitched together, plus a learnable bias.

    Reference: pytorch_networks_convae.py:802-1065. The slab widths derive
    from the kernel size and the bc_x/bc_y context:
    ``pad = k+1+(bc-1) if k == 5 else k+(bc-1)``. Note the reference stitches
    the band computed from the *first* rows at the END of the output
    (its "top"/"bottom" naming is row-flipped); we reproduce that exactly
    since trained weights depend on it (:1055-1060).

    Output spatial size is (H + 2*(bc_y-1), W + 2*(bc_x-1)).
    """

    features: int
    kernel_size: int
    use_symm: bool = False
    bc_x: int = 1
    bc_y: int = 1
    dtype: Optional[jnp.dtype] = None

    def _make_conv(self, name):
        if self.use_symm:
            return SymmetricConv2d(
                self.features, self.kernel_size,
                symmetry=default_symmetry(self.features),
                use_bias=False, padding="VALID", dtype=self.dtype, name=name)
        return Conv2dTorch(
            self.features, self.kernel_size, use_bias=False,
            padding="VALID", dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad_x = (k + 1 if k == 5 else k) + (self.bc_x - 1)
        pad_y = (k + 1 if k == 5 else k) + (self.bc_y - 1)

        conv = self._make_conv("conv")
        conv_tl = self._make_conv("conv_top_left")
        conv_tr = self._make_conv("conv_top_right")
        conv_bl = self._make_conv("conv_bottom_left")
        conv_br = self._make_conv("conv_bottom_right")
        conv_t = self._make_conv("conv_top")
        conv_b = self._make_conv("conv_bottom")
        conv_l = self._make_conv("conv_left")
        conv_r = self._make_conv("conv_right")

        top_left = conv_tl(x[:, :pad_y, :pad_x, :])
        bottom_left = conv_bl(x[:, -pad_y:, :pad_x, :])
        top_right = conv_tr(x[:, :pad_y, -pad_x:, :])
        bottom_right = conv_br(x[:, -pad_y:, -pad_x:, :])
        top = conv_t(x[:, :pad_y, :, :])
        bottom = conv_b(x[:, -pad_y:, :, :])
        left = conv_l(x[:, :, :pad_x, :])
        right = conv_r(x[:, :, -pad_x:, :])
        inner = conv(x)

        mid = jnp.concatenate([left, inner, right], axis=2)
        top = jnp.concatenate([top_left, top, top_right], axis=2)
        bottom = jnp.concatenate([bottom_left, bottom, bottom_right], axis=2)
        # Reference stitch order: [bottom-slab, interior, top-slab] where the
        # "bottom" slab is computed from the LAST rows
        # (pytorch_networks_convae.py:1060).
        y = jnp.concatenate([bottom, mid, top], axis=1)

        bias = self.param(
            "learnable_bias",
            nn.initializers.zeros_init(),
            (1, 1, 1, self.features),
            self.dtype or x.dtype,
        )
        return y + bias


class GroupNormTorch(nn.Module):
    """GroupNorm matching torch defaults (eps=1e-5, affine)."""

    num_groups: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.dtype or x.dtype)(x)


class FluidLayer(nn.Module):
    """(Symmetric | plain | boundary-learned) conv + GroupNorm + activation
    + dropout. Reference: pytorch_networks_convae.py:702-799.

    ``r_p`` selects the conv/padding flavour: "learned" uses
    :class:`BoundaryLearnedConvolution2D`; otherwise a SAME conv with the
    given torch padding mode ("zeros" → constant, "replicate", ...).
    """

    features: int
    act_fn: str = "selu"
    r_p: str = "zeros"
    use_symm: bool = False
    dilation: int = 1
    kernel_size: int = 3
    drop_rate: float = 0.0
    bc_x: int = 1
    bc_y: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c_o = self.features
        if self.r_p == "learned":
            y = BoundaryLearnedConvolution2D(
                c_o, self.kernel_size, use_symm=self.use_symm,
                bc_x=self.bc_x, bc_y=self.bc_y, dtype=self.dtype,
                name="conv")(x)
        else:
            pad_mode = "constant" if self.r_p == "zeros" else self.r_p
            if self.use_symm:
                y = SymmetricConv2d(
                    c_o, self.kernel_size,
                    symmetry=default_symmetry(c_o),
                    padding="SAME", pad_mode=pad_mode,
                    dilation=self.dilation, dtype=self.dtype,
                    name="conv")(x)
            else:
                y = Conv2dTorch(
                    c_o, self.kernel_size, padding="SAME",
                    pad_mode=pad_mode, dilation=self.dilation,
                    dtype=self.dtype, name="conv")(x)

        # GroupNorm(c_o / min(4, c_o)) groups (pytorch_networks_convae.py:788).
        y = GroupNormTorch(max(1, c_o // min(4, c_o)), dtype=self.dtype,
                           name="gn")(y)
        y = get_activation(self.act_fn)(y)
        if self.drop_rate > 0.0:
            y = nn.Dropout(rate=self.drop_rate, deterministic=deterministic)(y)
        return y


class SpectralConv2d(nn.Module):
    """2-D Fourier (FNO) layer: rFFT2 → low-mode complex mixing → irFFT2.

    Reference: pytorch_networks_convae.py:571-635 (modes hard-coded to 4×4).
    Complex weights are stored as separate real/imag params (TPU-friendly;
    also what Orbax serializes cleanly).
    """

    features: int
    modes1: int = 4
    modes2: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: NHWC. FFT over spatial dims.
        B, H, W, C = x.shape
        c_o = self.features
        scale = 1.0 / (C * c_o)

        def w_init(key, shape, dtype):
            return scale * jax.random.uniform(key, shape, dtype)

        dt = self.dtype or x.dtype
        shapes = (C, c_o, self.modes1, self.modes2)
        w1r = self.param("weights1_real", w_init, shapes, dt)
        w1i = self.param("weights1_imag", w_init, shapes, dt)
        w2r = self.param("weights2_real", w_init, shapes, dt)
        w2i = self.param("weights2_imag", w_init, shapes, dt)
        w1 = w1r + 1j * w1i
        w2 = w2r + 1j * w2i

        # NHWC → NCHW for FFT convenience, mirroring the reference layout.
        xc = jnp.transpose(x, (0, 3, 1, 2))
        x_ft = jnp.fft.rfft2(xc)

        out_ft = jnp.zeros((B, c_o, H, W // 2 + 1), dtype=x_ft.dtype)
        top = jnp.einsum("bixy,ioxy->boxy",
                         x_ft[:, :, : self.modes1, : self.modes2], w1)
        bot = jnp.einsum("bixy,ioxy->boxy",
                         x_ft[:, :, -self.modes1:, : self.modes2], w2)
        out_ft = out_ft.at[:, :, : self.modes1, : self.modes2].set(top)
        out_ft = out_ft.at[:, :, -self.modes1:, : self.modes2].set(bot)

        y = jnp.fft.irfft2(out_ft, s=(H, W)).astype(x.dtype)
        return jnp.transpose(y, (0, 2, 3, 1))


class SpectralFluidLayer(nn.Module):
    """SpectralConv2d + GroupNorm + activation
    (reference: pytorch_networks_convae.py:638-699)."""

    features: int
    act_fn: str = "selu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic
        y = SpectralConv2d(self.features, dtype=self.dtype, name="conv")(x)
        y = GroupNormTorch(max(1, self.features // 4), dtype=self.dtype,
                           name="gn")(y)
        return get_activation(self.act_fn)(y)
