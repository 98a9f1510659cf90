"""Microbenchmark: space_to_depth_rect lowering variants on TPU.

The 128×506 rollout profile attributes ~0.19 ms/step to the INPUT
space_to_depth_rect (s2d.py:92-93 reshape+copy) — 12% of the step. This
times candidate lowerings of the same permutation on the real input
shape so the winner can replace the 6-D transpose form:

  v_transpose — current: reshape (B,h,fr,w,fc,C) + transpose + reshape
  v_sliced    — free minor-dims reshape (W,C)->(w,fc*C), fr strided row
                slices (above the tiled dims), one lane concat
  v_1ch       — the sliced form applied to a single channel (the
                T-feature path: only T-dependent lanes move per step)

Usage: python tools/microbench_s2d.py [H W C reps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from pbml_mantle_convection_tpu.ops.s2d import space_to_depth_rect

FR, FC = 2, 4


def s2d_rect_sliced(x, fr, fc):
    B, H, W, C = x.shape
    x2 = x.reshape(B, H, W // fc, fc * C)
    parts = [x2[:, r::fr] for r in range(fr)]
    return jnp.concatenate(parts, axis=-1)


def d2s_rect_sliced(y, fr, fc, C):
    B, h, w, _ = y.shape
    parts = [y[..., r * fc * C:(r + 1) * fc * C] for r in range(fr)]
    x2 = jnp.stack(parts, axis=2).reshape(B, h * fr, w, fc * C)
    return x2.reshape(B, h * fr, w * fc, C)


def chain_timer(s2d_fn, d2s_fn, x, C, iters=2000):
    """Device time per s2d+d2s round trip: a scan whose carry chains
    through both ops (the +0.0*i prevents loop-invariant hoisting)."""
    @jax.jit
    def run(x0):
        def body(c, i):
            y = s2d_fn(c + 0.0 * i)
            return d2s_fn(y), ()
        out, _ = jax.lax.scan(body, x0, jnp.arange(iters, dtype=x0.dtype))
        return out
    jax.block_until_ready(run(x))     # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters * 1e6  # us per pair


def main(H=128, W=508, C=7, iters=2000):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, H, W, C), jnp.float32)
    x1 = x[..., :1]

    f_t = jax.jit(lambda a: space_to_depth_rect(a, FR, FC))
    f_s = jax.jit(lambda a: s2d_rect_sliced(a, FR, FC))

    # exactness first
    np.testing.assert_array_equal(np.asarray(f_t(x)), np.asarray(f_s(x)))
    y = f_t(x)
    g_s = jax.jit(lambda a: d2s_rect_sliced(a, FR, FC, C))
    np.testing.assert_array_equal(np.asarray(g_s(y)), np.asarray(x))
    print("exactness: sliced == transpose (s2d and d2s)")

    from pbml_mantle_convection_tpu.ops.s2d import depth_to_space_rect
    print(f"shape (1,{H},{W},{C}), {iters} chained pairs "
          f"(us per s2d+d2s round trip):")
    print(f"  transpose pair: "
          f"{chain_timer(lambda a: space_to_depth_rect(a, FR, FC), lambda b: depth_to_space_rect(b, FR, FC, C), x, C, iters):8.2f}")
    print(f"  sliced pair   : "
          f"{chain_timer(lambda a: s2d_rect_sliced(a, FR, FC), lambda b: d2s_rect_sliced(b, FR, FC, C), x, C, iters):8.2f}")
    print(f"  sliced 1ch    : "
          f"{chain_timer(lambda a: s2d_rect_sliced(a, FR, FC), lambda b: d2s_rect_sliced(b, FR, FC, 1), x1, 1, iters):8.2f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*[int(v) for v in a])
