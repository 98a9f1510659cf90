"""ViT baseline (stock lucidrains architecture).

Reference: vit_pytorch-checkpoint.py:85-133 (patch embedding, cls token,
pre-norm transformer, mlp head), trained via the one_epoch_AD loop in
train_uvpT_vit-checkpoint.ipynb. Kept as the experiment baseline it is in
the reference — not a production surrogate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import torch_linear_kernel_init


def _pair(v):
    return v if isinstance(v, tuple) else (v, v)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=torch_linear_kernel_init)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=torch_linear_kernel_init)(x)
        return x


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       kernel_init=torch_linear_kernel_init)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * self.dim_head ** -0.5,
            axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype,
                           kernel_init=torch_linear_kernel_init)(out)
        return out


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = Attention(self.dim, self.heads, self.dim_head,
                          dtype=self.dtype, name=f"attn_{i}")(x) + x
            x = FeedForward(self.dim, self.mlp_dim, dtype=self.dtype,
                            name=f"ff_{i}")(x) + x
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class ViTField(nn.Module):
    """ViT with a field-regression head: image (B, H, W, C) →
    (u, v, p|None) fields of shape (B, H, W).

    The reference trains its stock ViT on the uvpT task through
    ``one_epoch_AD`` (train_uvpT_vit-checkpoint.ipynb) with the mlp head
    regressing the flattened output fields; this wrapper makes that wiring
    explicit and runnable.
    """

    image_size: Tuple[int, int]
    patch_size: Tuple[int, int] = (8, 8)
    c_o: int = 2
    dim: int = 128
    depth: int = 4
    heads: int = 4
    mlp_dim: int = 256
    channels: int = 7
    p_pred: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img):
        H, W = self.image_size
        y = ViT(image_size=self.image_size, patch_size=self.patch_size,
                num_classes=self.c_o * H * W, dim=self.dim,
                depth=self.depth, heads=self.heads, mlp_dim=self.mlp_dim,
                channels=self.channels, dtype=self.dtype, name="vit")(img)
        y = y.reshape(-1, self.c_o, H, W)
        u = y[:, 0]
        v = y[:, 1]
        p = y[:, 2] if (self.p_pred and self.c_o > 2) else None
        return u, v, p


class ViT(nn.Module):
    """image (B, H, W, C) → (B, num_classes)."""

    image_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img):
        ph, pw = _pair(self.patch_size)
        B, H, W, C = img.shape
        assert H % ph == 0 and W % pw == 0, \
            "Image dimensions must be divisible by the patch size."
        nh, nw = H // ph, W // pw
        n = nh * nw

        # b (h ph) (w pw) c -> b (h w) (ph pw c)
        x = img.reshape(B, nh, ph, nw, pw, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, n, ph * pw * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=torch_linear_kernel_init)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim), self.dtype or img.dtype)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.dim), self.dtype or img.dtype)
        cls = jnp.broadcast_to(cls, (B, 1, self.dim))
        x = jnp.concatenate((cls, x), axis=1) + pos[:, : n + 1]

        x = Transformer(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, dtype=self.dtype)(x)
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=torch_linear_kernel_init)(x)
