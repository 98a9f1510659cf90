"""jit wrapper carrying the TPU compiler options the framework needs.

The whole-branch Pallas megakernel (ops/branch_kernel.py) keeps a full
branch activation VMEM-resident; at the flagship 256x256 configuration
its scoped-VMEM stack exceeds XLA's conservative 16 MiB default (TPU
v5e has 128 MiB of physical VMEM). Any jit whose graph may contain the
fast path's megakernel should be created with :func:`tpu_jit`, which
raises the scoped limit on TPU backends and is a plain ``jax.jit``
elsewhere (CPU interpret-mode Pallas has no scoped-VMEM notion).
"""

import jax

TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


def tpu_jit(fun, **kw):
    """``jax.jit`` with the framework's TPU compiler options merged in."""
    if jax.default_backend() == "tpu":
        opts = dict(TPU_COMPILER_OPTIONS)
        opts.update(kw.pop("compiler_options", None) or {})
        kw["compiler_options"] = opts
    return jax.jit(fun, **kw)
