"""Sequence-parallel Physics-Attention vs the single-device module."""

import numpy as np
import jax
import jax.numpy as jnp

from pbml_mantle_convection_tpu.models import PhysicsAttentionIrregularMesh
from pbml_mantle_convection_tpu.parallel.mesh import make_mesh
from pbml_mantle_convection_tpu.parallel.sequence import (
    physics_attention_ref, physics_attention_sharded)


def test_functional_matches_module():
    m = PhysicsAttentionIrregularMesh(dim=16, heads=2, dim_head=8,
                                      slice_num=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 16)))
    params = m.init(jax.random.PRNGKey(0), x)
    y_mod = m.apply(params, x)
    y_fn = physics_attention_ref(params, x, heads=2, dim_head=8)
    np.testing.assert_allclose(np.asarray(y_fn), np.asarray(y_mod),
                               rtol=1e-12, atol=1e-12)


def test_sharded_matches_reference_on_mesh():
    """Sharding the N axis over 8 CPU devices must reproduce the
    single-device result (two psums of slice numerators/denominators)."""
    m = PhysicsAttentionIrregularMesh(dim=16, heads=2, dim_head=8,
                                      slice_num=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 128, 16)))
    params = m.init(jax.random.PRNGKey(0), x)
    ref = physics_attention_ref(params, x, heads=2, dim_head=8)

    mesh = make_mesh(8)
    out = physics_attention_sharded(params, x, mesh, heads=2, dim_head=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)
