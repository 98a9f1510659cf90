"""Transolver: Physics-Attention surrogates (irregular + structured mesh).

TPU-native Flax redesign of the reference's Transolver stack
(Physics_Attention-checkpoint.py:6-175,
Transolver_Structured_Mesh_2D-checkpoint.py:13-204,
Transolver-checkpoint.py:126-217). Physics-Attention compresses the
N = H·W point sequence into ``slice_num`` tokens via learned soft slices
(two einsums around a small quadratic attention), which is what makes a
64,768-point grid tractable — and maps to three MXU matmul chains on TPU.

A fused Pallas slice-attention kernel lives in ops/slice_attention.py;
these modules use plain einsums, which measure 3.4× faster than the kernel
at the reference shapes (PERF.md) — XLA batches the head einsums better
than per-(batch, head) kernel grids.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.curl import curl_head_valid


def trunc_normal_init(std=0.02):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                                 dtype)
    return init


class Dense(nn.Module):
    """Linear layer with trunc-normal(0.02) weights and zero bias — the
    reference's Transolver init (_init_weights,
    Transolver_Structured_Mesh_2D-checkpoint.py:144-151)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", trunc_normal_init(0.02),
                       (x.shape[-1], self.features), self.dtype or x.dtype)
        y = x @ k
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), self.dtype or x.dtype)
            y = y + b
        return y


class TransolverMLP(nn.Module):
    """MLP with optional residual hidden layers
    (Transolver_Structured_Mesh_2D-checkpoint.py:13-38)."""

    n_hidden: int
    n_output: int
    n_layers: int = 1
    act: str = "gelu"
    res: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = getattr(jax.nn, self.act) if self.act != "gelu" else (
            lambda v: jax.nn.gelu(v, approximate=False))
        x = act(Dense(self.n_hidden, dtype=self.dtype, name="linear_pre")(x))
        for i in range(self.n_layers):
            h = act(Dense(self.n_hidden, dtype=self.dtype,
                          name=f"linears_{i}")(x))
            x = h + x if self.res else h
        return Dense(self.n_output, dtype=self.dtype, name="linear_post")(x)


def _slice_attention(fx_mid, x_mid, slice_proj, temperature,
                     to_q, to_k, to_v, scale):
    """The Physics-Attention core: slice → token attention → deslice.

    fx_mid, x_mid: (B, Heads, N, D). Returns (B, Heads, N, D).
    Reference: Physics_Attention-checkpoint.py:93-116.
    """
    slice_logits = slice_proj(x_mid) / temperature          # B H N G
    slice_weights = jax.nn.softmax(slice_logits, axis=-1)
    slice_norm = jnp.sum(slice_weights, axis=2)              # B H G
    slice_token = jnp.einsum("bhnc,bhng->bhgc", fx_mid, slice_weights)
    slice_token = slice_token / (slice_norm[..., None] + 1e-5)

    q = to_q(slice_token)
    k = to_k(slice_token)
    v = to_v(slice_token)
    dots = jnp.einsum("bhgc,bhfc->bhgf", q, k) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    out_token = jnp.einsum("bhgf,bhfc->bhgc", attn, v)

    return jnp.einsum("bhgc,bhng->bhnc", out_token, slice_weights)


class PhysicsAttentionIrregularMesh(nn.Module):
    """Physics-Attention for irregular meshes (Linear projections).
    Reference: Physics_Attention-checkpoint.py:6-57."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    slice_num: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        fx_mid = Dense(inner, dtype=self.dtype, name="in_project_fx")(x)
        x_mid = Dense(inner, dtype=self.dtype, name="in_project_x")(x)
        fx_mid = fx_mid.reshape(B, N, self.heads, self.dim_head
                                ).transpose(0, 2, 1, 3)
        x_mid = x_mid.reshape(B, N, self.heads, self.dim_head
                              ).transpose(0, 2, 1, 3)

        temperature = self.param(
            "temperature", nn.initializers.constant(0.5),
            (1, self.heads, 1, 1), self.dtype or x.dtype)

        slice_proj = Dense(self.slice_num, dtype=self.dtype,
                           name="in_project_slice")
        to_q = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_q")
        to_k = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_k")
        to_v = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_v")

        out = _slice_attention(fx_mid, x_mid, slice_proj, temperature,
                               to_q, to_k, to_v, self.dim_head ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class PhysicsAttentionStructuredMesh2D(nn.Module):
    """Physics-Attention with conv slice projections for structured 2-D
    grids. Reference: Physics_Attention-checkpoint.py:60-116. The
    temperature is clamped to [0.1, 5] in this variant (:99)."""

    dim: int
    H: int
    W: int
    heads: int = 8
    dim_head: int = 64
    slice_num: int = 64
    kernel: int = 5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from .layers import Conv2dTorch
        B, N, C = x.shape
        assert N == self.H * self.W
        inner = self.heads * self.dim_head
        img = x.reshape(B, self.H, self.W, C)

        fx_mid = Conv2dTorch(inner, self.kernel, padding="SAME",
                             pad_mode="constant", dtype=self.dtype,
                             name="in_project_fx")(img)
        x_mid = Conv2dTorch(inner, self.kernel, padding="SAME",
                            pad_mode="constant", dtype=self.dtype,
                            name="in_project_x")(img)
        fx_mid = fx_mid.reshape(B, N, self.heads, self.dim_head
                                ).transpose(0, 2, 1, 3)
        x_mid = x_mid.reshape(B, N, self.heads, self.dim_head
                              ).transpose(0, 2, 1, 3)

        temperature = self.param(
            "temperature", nn.initializers.constant(0.5),
            (1, self.heads, 1, 1), self.dtype or x.dtype)
        temperature = jnp.clip(temperature, 0.1, 5.0)

        slice_proj = Dense(self.slice_num, dtype=self.dtype,
                           name="in_project_slice")
        to_q = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_q")
        to_k = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_k")
        to_v = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_v")

        out = _slice_attention(fx_mid, x_mid, slice_proj, temperature,
                               to_q, to_k, to_v, self.dim_head ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class PhysicsAttentionStructuredMesh3D(nn.Module):
    """Physics-Attention with 3-D conv slice projections.
    Reference: Physics_Attention-checkpoint.py:119-175."""

    dim: int
    H: int
    W: int
    D: int
    heads: int = 8
    dim_head: int = 64
    slice_num: int = 32
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        assert N == self.H * self.W * self.D
        inner = self.heads * self.dim_head
        vol = x.reshape(B, self.H, self.W, self.D, C)

        def conv3d(name):
            def apply(v):
                k = self.kernel
                kern = self.param(
                    f"{name}_kernel", trunc_normal_init(0.02),
                    (k, k, k, C, inner), self.dtype or x.dtype)
                bias = self.param(f"{name}_bias",
                                  nn.initializers.zeros_init(),
                                  (inner,), self.dtype or x.dtype)
                import jax.lax as lax
                y = lax.conv_general_dilated(
                    v, kern, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=v.dtype)
                return y + bias
            return apply

        fx_mid = conv3d("in_project_fx")(vol).reshape(
            B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        x_mid = conv3d("in_project_x")(vol).reshape(
            B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        temperature = self.param(
            "temperature", nn.initializers.constant(0.5),
            (1, self.heads, 1, 1), self.dtype or x.dtype)
        temperature = jnp.clip(temperature, 0.1, 5.0)

        slice_proj = Dense(self.slice_num, dtype=self.dtype,
                           name="in_project_slice")
        to_q = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_q")
        to_k = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_k")
        to_v = Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_v")
        out = _slice_attention(fx_mid, x_mid, slice_proj, temperature,
                               to_q, to_k, to_v, self.dim_head ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class TransolverBlock(nn.Module):
    """LayerNorm → Physics-Attention → residual → MLP → residual
    (Transolver_Structured_Mesh_2D-checkpoint.py:41-77)."""

    num_heads: int
    hidden_dim: int
    H: int
    W: int
    mlp_ratio: int = 4
    last_layer: bool = False
    out_dim: int = 1
    slice_num: int = 32
    kernel: int = 3
    structured: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fx):
        if self.structured:
            attn = PhysicsAttentionStructuredMesh2D(
                self.hidden_dim, H=self.H, W=self.W, heads=self.num_heads,
                dim_head=self.hidden_dim // self.num_heads,
                slice_num=self.slice_num, kernel=self.kernel,
                dtype=self.dtype, name="Attn")
        else:
            attn = PhysicsAttentionIrregularMesh(
                self.hidden_dim, heads=self.num_heads,
                dim_head=self.hidden_dim // self.num_heads,
                slice_num=self.slice_num, dtype=self.dtype, name="Attn")
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        fx = attn(ln("ln_1")(fx)) + fx
        fx = TransolverMLP(self.hidden_dim * self.mlp_ratio,
                           self.hidden_dim, n_layers=0, res=False,
                           dtype=self.dtype, name="mlp")(
            ln("ln_2")(fx)) + fx
        if self.last_layer:
            return Dense(self.out_dim, dtype=self.dtype, name="mlp2")(
                ln("ln_3")(fx))
        return fx


def unified_pos_features(H, W, ref_x, ref_y, dtype=jnp.float32):
    """Distance-to-reference-grid positional features
    (Transolver_Structured_Mesh_2D-checkpoint.py:153-169)."""
    gx = np.linspace(0, 1, H)
    gy = np.linspace(0, 1, W)
    grid = np.stack(np.meshgrid(gx, gy, indexing="ij"), axis=-1)  # H W 2
    rx = np.linspace(0, 1, ref_x)
    ry = np.linspace(0, 1, ref_y)
    ref = np.stack(np.meshgrid(rx, ry, indexing="ij"), axis=-1
                   ).reshape(-1, 2)  # (ref_x*ref_y, 2)
    pos = np.sqrt(((grid[:, :, None, :] - ref[None, None, :, :]) ** 2
                   ).sum(-1))
    return jnp.asarray(pos.reshape(1, H * W, ref_x * ref_y), dtype)


class TransolverStructured2D(nn.Module):
    """Structured-mesh Transolver with the shared curl head.

    Input: (B, N, space_dim + fun_dim) with the first ``space_dim``
    channels being coordinates (Transolver_Structured_Mesh_2D
    -checkpoint.py:171-204). Output (u, v, p|None) via the stream
    function; u, v are (B, H-2, W-2) (the reference's VALID head).
    """

    H: int = 128
    W: int = 506
    space_dim: int = 2
    fun_dim: int = 5
    n_layers: int = 5
    n_hidden: int = 256
    n_head: int = 8
    mlp_ratio: int = 1
    out_dim: int = 1
    slice_num: int = 32
    ref: int = 8
    unified_pos: bool = False
    a_bound: float = 10.0
    p_pred: bool = False
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, data):
        x = data[:, :, :self.space_dim]
        fx = data[:, :, self.space_dim:]

        if self.unified_pos:
            pos = unified_pos_features(self.H, self.W, self.ref,
                                       self.ref * 4, data.dtype)
            x = jnp.broadcast_to(pos, (data.shape[0],) + pos.shape[1:])

        fx = TransolverMLP(self.n_hidden * 2, self.n_hidden, n_layers=0,
                           res=False, dtype=self.dtype,
                           name="preprocess")(
            jnp.concatenate((x, fx), axis=-1))

        for i in range(self.n_layers):
            fx = TransolverBlock(
                num_heads=self.n_head, hidden_dim=self.n_hidden,
                H=self.H, W=self.W, mlp_ratio=self.mlp_ratio,
                last_layer=(i == self.n_layers - 1), out_dim=self.out_dim,
                slice_num=self.slice_num, kernel=self.kernel,
                dtype=self.dtype, name=f"blocks_{i}")(fx)

        fx = fx.reshape(-1, self.H, self.W, self.out_dim)
        a = fx[..., 0] * self.a_bound
        # NOTE: the reference returns channel 0 (the stream function) as
        # "pressure" (Transolver_Structured_Mesh_2D-checkpoint.py:197) —
        # a preserved reference quirk; channel 1 is unused under p_pred.
        p = fx[:, 1:-1, 1:-1, 0] if self.p_pred else None
        u, v = curl_head_valid(a)
        return u, v, p


class TransolverIrregular(nn.Module):
    """Irregular-mesh Transolver (point clouds); returns per-point features
    mapped to out_dim. Reference: Transolver-checkpoint.py:126-217."""

    space_dim: int = 3
    fun_dim: int = 0
    n_layers: int = 5
    n_hidden: int = 256
    n_head: int = 8
    mlp_ratio: int = 1
    out_dim: int = 1
    slice_num: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, data):
        x = data
        fx = TransolverMLP(self.n_hidden * 2, self.n_hidden, n_layers=0,
                           res=False, dtype=self.dtype,
                           name="preprocess")(x)
        placeholder = self.param(
            "placeholder",
            lambda k, s, d: (1.0 / self.n_hidden) * jax.random.uniform(
                k, s, d),
            (self.n_hidden,), self.dtype or data.dtype)
        if self.fun_dim == 0:
            fx = fx + placeholder[None, None, :]

        for i in range(self.n_layers):
            fx = TransolverBlock(
                num_heads=self.n_head, hidden_dim=self.n_hidden,
                H=0, W=0, mlp_ratio=self.mlp_ratio,
                last_layer=(i == self.n_layers - 1), out_dim=self.out_dim,
                slice_num=self.slice_num, structured=False,
                dtype=self.dtype, name=f"blocks_{i}")(fx)
        return fx
