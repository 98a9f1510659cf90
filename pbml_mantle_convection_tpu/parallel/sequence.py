"""Sequence-parallel Physics-Attention: shard the grid-point axis over the
device mesh.

The Transolver's slice attention pools the N = H·W point sequence into
``slice_num`` tokens via softmax slice weights, attends among the tokens,
and broadcasts back (Physics_Attention-checkpoint.py:31-57). The pooling
numerator/denominator are plain sums over N — so the whole layer
parallelizes over points with two ``psum``s, exactly the extension sketched
in SURVEY.md §2.2 (not reference behaviour; a TPU-native capability for
grids that exceed one chip).

Functional forms (reading the Flax param dict of
``PhysicsAttentionIrregularMesh``) are provided so the sharded version is
verifiable against the module: ``physics_attention_ref`` == gather ∘
``physics_attention_sharded`` ∘ shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _heads_split(y, B, n, heads, dim_head):
    return y.reshape(B, n, heads, dim_head).transpose(0, 2, 1, 3)


def _local_qkv(p, x, heads, dim_head):
    """Per-point projections (fully local in N)."""
    B, n, _ = x.shape
    fx_mid = x @ p["in_project_fx"]["kernel"] + p["in_project_fx"]["bias"]
    x_mid = x @ p["in_project_x"]["kernel"] + p["in_project_x"]["bias"]
    return (_heads_split(fx_mid, B, n, heads, dim_head),
            _heads_split(x_mid, B, n, heads, dim_head))


def physics_attention_ref(params, x, heads: int, dim_head: int):
    """Single-device functional PhysicsAttentionIrregularMesh forward
    (must match the Flax module bit-for-bit)."""
    p = params["params"] if "params" in params else params
    B, N, _ = x.shape
    fx_mid, x_mid = _local_qkv(p, x, heads, dim_head)

    logits = (x_mid @ p["in_project_slice"]["kernel"]
              + p["in_project_slice"]["bias"]) / p["temperature"]
    w = jax.nn.softmax(logits, axis=-1)                      # B H N G
    num = jnp.einsum("bhnc,bhng->bhgc", fx_mid, w)
    den = jnp.sum(w, axis=2)
    token = num / (den[..., None] + 1e-5)

    q = token @ p["to_q"]["kernel"]
    k = token @ p["to_k"]["kernel"]
    v = token @ p["to_v"]["kernel"]
    attn = jax.nn.softmax(
        jnp.einsum("bhgc,bhfc->bhgf", q, k) * dim_head ** -0.5, axis=-1)
    out_token = jnp.einsum("bhgf,bhfc->bhgc", attn, v)

    out = jnp.einsum("bhgc,bhng->bhnc", out_token, w)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, heads * dim_head)
    return out @ p["to_out"]["kernel"] + p["to_out"]["bias"]


def physics_attention_sharded(params, x_sharded, mesh: Mesh,
                              heads: int, dim_head: int,
                              axis: str = "data"):
    """Sequence-parallel forward: ``x_sharded`` has its N axis sharded over
    ``mesh[axis]``; the output keeps that sharding. Cross-device
    communication: two psums of (B, H, G, D)+(B, H, G) — independent of N.
    """
    p = params["params"] if "params" in params else params

    def local(x_loc):
        B, n, _ = x_loc.shape
        fx_mid, x_mid = _local_qkv(p, x_loc, heads, dim_head)
        logits = (x_mid @ p["in_project_slice"]["kernel"]
                  + p["in_project_slice"]["bias"]) / p["temperature"]
        w = jax.nn.softmax(logits, axis=-1)

        num = jax.lax.psum(
            jnp.einsum("bhnc,bhng->bhgc", fx_mid, w), axis)
        den = jax.lax.psum(jnp.sum(w, axis=2), axis)
        token = num / (den[..., None] + 1e-5)

        q = token @ p["to_q"]["kernel"]
        k = token @ p["to_k"]["kernel"]
        v = token @ p["to_v"]["kernel"]
        attn = jax.nn.softmax(
            jnp.einsum("bhgc,bhfc->bhgf", q, k) * dim_head ** -0.5,
            axis=-1)
        out_token = jnp.einsum("bhgf,bhfc->bhgc", attn, v)

        out = jnp.einsum("bhgc,bhng->bhnc", out_token, w)
        out = out.transpose(0, 2, 1, 3).reshape(B, n, heads * dim_head)
        return out @ p["to_out"]["kernel"] + p["to_out"]["bias"]

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(None, axis, None),
                   out_specs=P(None, axis, None))
    return fn(x_sharded)
