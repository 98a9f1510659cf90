"""Whole-branch Pallas megakernel for the NewFluidNet fast path.

PERF.md idea 1: execute an entire branch stack (``repeats`` FluidLayers —
conv + learned-boundary bands + bias + GroupNorm + activation) as ONE
``pallas_call`` with the activation resident in VMEM across layers.
Removes, per layer, the XLA-level band machinery that dominates the step
(grouped band convs ~0.54 ms + s2d/d2s slab relayouts ~0.42 + scatter
~0.22 of a 2.82 ms step at 256², PERF.md profiler attribution).

Layout: rectangular space-to-depth with **fr=2 rows × fc=4 cols** —
lane size fr·fc·C = 8C = exactly 128 at the flagship C=16, so every
dot contracts the full MXU width and no physical lane padding occurs
(the earlier square f=2 draft had C=64 lanes padded to 128: half the
throughput and double the VMEM).

Band decomposition (k=5, bc=1 ⇒ band width 2):

* rows — 2-dense-row bands are whole fr=2 block rows; each is a plain
  9-tap s2d matmul of the main-conv structure with that edge's weights
  evaluated at a shifted block row (the reference's row-flip stitch
  quirk becomes "evaluate near the opposite edge"):
      top rows {0,1}        = conv_bottom at block row hr-2
      bottom rows {H-2,H-1} = conv_top    at block row 1
* cols — 2-dense-col bands are lane *groups* of the fc=4 edge block
  cols; the stitch's shift-by-2 turns into a lane-group permutation
  (a 0/1 128×128 matmul — no reshapes, Mosaic-legal):
      left  cols {0,1}     = groups b∈{2,3} of conv_left  at block col 0
      right cols {W-2,W-1} = groups b∈{0,1} of conv_right at block col wc-1
* corners — single blocks at the crossings, same lane permutation.

The streamed band weights are PACKED 2-per-slot (``_band_slots``): a
col/corner pair's folded matrices have disjoint live output lane
groups, so each pair shares one (3,3,C,C) matrix — 5 slots per layer
instead of 8 (aligned) or 5+3·nE (ragged), cutting the dominant
weight-stream bytes ~37-45% (PERF.md round-4: +3.9% at 256², +5.6% at
128×506). Ragged widths park the right-edge outputs on their own lane
groups and un-park at assembly with exact per-(eval,target) 0/1
matmuls.

Assembly is concatenation over block rows/cols plus lane mask-selects
(Mosaic has no scatter and no lane-dim reshapes); GroupNorm statistics
run as 0/1-matrix matmuls; the default in-kernel GELU is a divide-free
odd minimax erf fit at bf16-grade accuracy (Mosaic has no erf
primitive; ``gelu_erf_kernel`` provides XLA's own f32 erf polynomial
for ``exact_gelu``). The grid
dimension streams each layer's weights with Pallas' automatic double
buffering while x/out stay in HBM (whole-buffer DMAs — Mosaic requires
sliced DMA regions be 128-aligned on lanes, so the zero halo travels
with the field and the caller pads/slices in XLA).

Band semantics verified against the Flax module by
tests/test_branch_kernel.py (same standard as tests/test_fast_path.py).

Supported (the flagship rollout configuration): B=1, k=5, bc=1,
r_p in {learned, zeros}, H % 2 == 0, any W ≥ 9 (a non-4-divisible
width — e.g. the reference's production 128×506 grid and its pooled
253/126/63/31 chain — runs on a ragged last block column whose pad
lane groups carry exact zeros; see ``_ragged_plan``), ≥3 block
rows/cols, no dropout/spectral. Callers fall back to the standard
fast path otherwise. The merge stage's trunk kernel (in-kernel bicubic + the
87-channel merge conv) lives in ops/merge_kernel.py and shares this
module's _fluid_layer_op/_pool_op.
Reference: pytorch_networks_convae.py:1022-1065 (BLC stitch),
:702-799 (FluidLayer).
"""

from __future__ import annotations

import functools
import os
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .s2d import s2d_conv_weights_rect

FR = 2   # block rows  (dense rows per block — bands = whole block rows)
FC = 4   # block cols  (dense cols per block — bands = lane groups)

# XLA's ErfImpl32 rational-polynomial coefficients (the same approximation
# the erf HLO lowers to for float32): erf(x) ≈ x·P(x²)/Q(x²), x∈[-4, 4].
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def erf_poly(x):
    """float32 erf via XLA's rational polynomial (see above)."""
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc
    p = jnp.asarray(_ERF_ALPHA[0], x.dtype)
    for a in _ERF_ALPHA[1:]:
        p = p * x2 + a
    q = jnp.asarray(_ERF_BETA[0], x.dtype)
    for b in _ERF_BETA[1:]:
        q = q * x2 + b
    return jnp.clip(xc * p / q, -1.0, 1.0)


def gelu_erf_kernel(x):
    """Exact (erf) GELU usable inside Mosaic kernels."""
    inv_sqrt2 = 0.7071067811865476
    return 0.5 * x * (1.0 + erf_poly(x * inv_sqrt2))


# divide-free odd minimax fit of erf(t), t∈[-3,3] clamped:
# max |GELU err| 1.5e-4 — an order below the bf16 MXU noise the conv
# path already carries at default precision. ~2× fewer VPU ops than the
# rational erf (no divide): the activation is a large share of in-kernel
# per-layer time.
_ERF_FAST = (-2.8470148000345211e-07, 1.303095779974869e-05,
             -0.00025807533560547047, 0.0029239602372714453,
             -0.021205922880053844, 0.1048617796705997,
             -0.37079225296696805, 1.1272902978054831)


def gelu_fast_kernel(x):
    """bf16-grade GELU for Mosaic kernels (see _ERF_FAST note)."""
    inv_sqrt2 = 0.7071067811865476
    t = jnp.clip(x * inv_sqrt2, -3.0, 3.0)
    t2 = t * t
    p = jnp.asarray(_ERF_FAST[0], x.dtype)
    for a in _ERF_FAST[1:]:
        p = p * t2 + a
    return 0.5 * x * (1.0 + t * p)


# the 8 BLC band kernels feeding Wband, in output-region order (flip
# quirk applied — see module docstring); packed 2-per-slot into 5
# streamed slots by ``_band_slots``
_BAND_SOURCES = (
    "conv_bottom",        # top output rows {0, 1}
    "conv_top",           # bottom output rows {H-2, H-1}
    "conv_left",          # left output cols {0, 1}
    "conv_right",         # right output cols {W-2, W-1}
    "conv_bottom_left",   # top-left corner block
    "conv_bottom_right",  # top-right corner block
    "conv_top_left",      # bottom-left corner block
    "conv_top_right",     # bottom-right corner block
)


def _group_mats(co, groups, C):
    """0/1 matrices (C, G) and (G, C): GroupNorm statistics and
    broadcast-back as matmuls (no lane reshapes in Mosaic). Lanes beyond
    fr·fc·co (the unified-C zero padding) map to no group."""
    n = FR * FC * co
    M = np.zeros((C, groups), np.float32)
    for kk in range(n):
        M[kk, (kk % co) // (co // groups)] = 1.0
    return M, np.ascontiguousarray(M.T)


def _round8(n: int) -> int:
    """Round a block-col count up to a sublane multiple. Mosaic lowers
    odd-size sublane-dim slices ~2× slower than 8-multiples (measured:
    the wc=127 kernels at 128×506/508 run 2.0× the wc=128 ones at
    128×512, same pixel count — PERF.md round-3); every kernel
    therefore runs at wc ≡ 0 (mod 8) with trailing all-pad block cols
    kept exact zero by the ragged plan."""
    return max(8, -(-n // 8) * 8)


def _ragged_plan(W: int, co: int, C: int, wc_run: int = None):
    """Static plan for a ragged last block column (W % FC != 0) and/or
    trailing all-pad block cols (wc_run > ceil(W / FC)).

    The field is laid out on wc_run block cols; dense cols ≥ W are zero
    pad lanes (groups b ≥ w_rem of the boundary block col eb, plus
    every block col > eb). The right-edge band outputs (dense cols W-2,
    W-1) and their conv centers (W-4, W-3) then no longer share one
    block column, so the single pre-folded lane permutation of the
    aligned path splits into:

    The right-edge band weights share ONE packed slot with the left
    band (see ``_band_slots``): each output dense col ``o`` is *parked*
    on its own lane group pb(o) ∈ {2, 3} — disjoint from the left
    band's b∈{0,1} target lanes — by the packed fold ``Fpark``, and
    un-parked at assembly time by a per-(eval, target) 0/1 extraction
    matrix ``umap[(e, t)]`` (park lane → true target lane d(o), zero
    elsewhere — it subsumes the select mask). Parking costs one
    HIGHEST-precision thin-strip matmul per use but removes the
    per-eval weight-slot copies from the streamed band bytes.

    Returns None when W is aligned and there are no trailing pad
    blocks, else a dict of numpy constants + static indices consumed by
    LayerStack/TrunkStack.
    """
    wc = -(-W // FC)
    if wc_run is None:
        wc_run = wc
    w_rem = W - (wc - 1) * FC
    if w_rem == FC and wc_run == wc:
        return None
    outs = (W - 2, W - 1)
    evals = tuple(sorted({(o - 2) // FC for o in outs}))
    targets = tuple(sorted({o // FC for o in outs}))
    Fpark = np.zeros((C, C), np.float32)
    umap = {}
    for oi, o in enumerate(outs):
        e, s = divmod(o - 2, FC)
        t, d = divmod(o, FC)
        pb = 2 + oi                     # unique park lane group per out
        U = umap.setdefault((e, t), np.zeros((C, C), np.float32))
        for a in range(FR):
            for c in range(co):
                Fpark[(a * FC + s) * co + c,
                      (a * FC + pb) * co + c] = 1.0
                U[(a * FC + pb) * co + c, (a * FC + d) * co + c] = 1.0
    keeps = {}
    for t in targets:
        u = np.zeros((C,), np.float32)
        for (e, tt), U in umap.items():
            if tt == t:
                u = np.maximum(u, (U.sum(axis=0) > 0).astype(np.float32))
        keeps[t] = 1.0 - u
    # keep-mask for valid lane groups of the last block col (pad lane
    # groups b >= w_rem zeroed each layer — the stored field keeps
    # exact zeros on pad lanes, so GroupNorm statistics and downstream
    # consumers never see garbage)
    pad_mask = np.zeros((C,), np.float32)
    for a in range(FR):
        for b in range(w_rem):
            lo = (a * FC + b) * co
            pad_mask[lo:lo + co] = 1.0
    return dict(wc=wc_run, w_rem=w_rem, eb=wc - 1, evals=evals,
                targets=targets, Fpark=Fpark, umap=umap, keeps=keeps,
                pad_mask=pad_mask)


def _band_slots(plan, P23, P01):
    """Static PACKED band-weight slot list — always 5 slots, each a
    list of ``(source_name, fold_or_None)`` members whose folded
    weights are summed into one streamed (3,3,C,C) matrix:

    0. top output rows (conv_bottom) — dense, unpacked;
    1. bottom output rows (conv_top) — dense, unpacked;
    2. left band (→ lanes b∈{0,1}) ⊕ right band (→ b∈{2,3} aligned,
       or the plan's park lanes when ragged);
    3. bottom-left ⊕ bottom-right corners (same lane split);
    4. top-left ⊕ top-right corners.

    The members' live output lane groups are disjoint, so one matrix
    carries both; use sites extract their half with the b01/b23 masks
    (aligned) or the plan's un-park matrices (ragged). Versus the old
    one-slot-per-source layout this removes 3 (aligned) to 6 (ragged
    nE=2) of the streamed (C, C) tap matrices per layer — the band
    stream measured at ~9% of the step (PERF.md band footprint)."""
    right = P01 if plan is None else plan["Fpark"]
    return [
        [("conv_bottom", None)],
        [("conv_top", None)],
        [("conv_left", P23), ("conv_right", right)],
        [("conv_bottom_left", P23), ("conv_bottom_right", right)],
        [("conv_top_left", P23), ("conv_top_right", right)],
    ]


def _perm_rows(plan, m01, m23, pool_mask=None):
    """Stack the lane-mask rows consumed in-kernel via ``perm_ref`` and
    return (rows, ragged_static, pool_mask_row, uexts). Row 0/1 are the
    aligned-path keep masks; a ragged plan appends its pad keep mask
    and the per-target keep masks, and stacks the un-park extraction
    matrices into ``uexts`` ((nU, C, C) or None) indexed from the
    ragged dict's target tuples."""
    rows = [m01, m23]
    ragged = None
    uexts = None
    if plan is not None:
        pad_row = len(rows)
        rows.append(plan["pad_mask"])
        umats = []
        tstat = []
        for t in plan["targets"]:
            keep_row = len(rows)
            rows.append(plan["keeps"][t])
            ssel = []
            for ei, e in enumerate(plan["evals"]):
                if (e, t) in plan["umap"]:
                    ssel.append((ei, len(umats)))
                    umats.append(plan["umap"][(e, t)])
            tstat.append((t, keep_row, tuple(ssel)))
        ragged = dict(evals=plan["evals"], targets=tuple(tstat),
                      pad_row=pad_row, eb=plan["eb"])
        uexts = np.stack(umats)
    pool_mask_row = None
    if pool_mask is not None:
        pool_mask_row = len(rows)
        rows.append(pool_mask)
    return np.stack(rows), ragged, pool_mask_row, uexts


def _lane_shift_mats(co, C):
    """0/1 (C, C) lane permutations moving column groups b∈{2,3}→{0,1}
    (P23to01) and b∈{0,1}→{2,3} (P01to23), plus the keep-masks for the
    complementary groups. Lane index = (a·FC + b)·co + c."""
    P23to01 = np.zeros((C, C), np.float32)
    P01to23 = np.zeros((C, C), np.float32)
    mask_b01 = np.zeros((C,), np.float32)
    mask_b23 = np.zeros((C,), np.float32)
    for a in range(FR):
        for b in range(FC):
            for c in range(co):
                lane = (a * FC + b) * co + c
                if b < 2:
                    mask_b01[lane] = 1.0
                    P01to23[lane, (a * FC + b + 2) * co + c] = 1.0
                else:
                    mask_b23[lane] = 1.0
                    P23to01[lane, (a * FC + b - 2) * co + c] = 1.0
    return P23to01, P01to23, mask_b01, mask_b23


def _fluid_layer_op(srcs, wm, wb, bias_row, gns_row, gnb_row, gmat_ref,
                    gmat_t_ref, perm_ref, *, hr, wc, co, groups, act,
                    learned, acc_dtype, use_gn=True, use_act=True,
                    W_valid=None, ragged=None, acc_ref=None,
                    uext_ref=None):
    """One FluidLayer on haloed scratch ref(s): main conv + boundary
    bands + bias [+ GroupNorm] [+ activation].

    ``srcs`` is a LIST of same-grid haloed scratches whose lane ranges
    together form the input channels (a single-element list for plain
    stacks; one per trunk piece for the merge kernel — the lane concat
    never materializes, each piece contributes its own dots).
    ``wm(p, P, Q)`` / ``wb(p, i, P, Q)`` return piece p's weight chunk
    values; returns the (hr, wc, Cout) result (caller stores it)."""
    H, W = hr * FR, wc * FC
    nsrc = len(srcs)

    def dot(xs, wv, precision=None):
        # bf16-stored conv weights (TPU): cast the activation side to
        # bf16 too — bit-identical to the default MXU precision on f32
        # operands (which truncates both to bf16), at half the weight
        # streaming bandwidth. Stat/affine consts stay f32.
        if wv.dtype == jnp.bfloat16:
            xs = xs.astype(jnp.bfloat16)
        return lax.dot_general(xs, wv, (((xs.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=acc_dtype,
                               precision=precision)

    # ---- main conv: 9 shifted s2d taps (padded scratch) ----
    # With many source pieces (the merge-trunk kernel's 6), a single
    # value-chain accumulation keeps every piece's partial live at
    # once and Mosaic's register allocator spills tens of MB of vregs
    # (measured 85 MB at 128×506 — over physical VMEM). ``acc_ref``
    # (a haloed (hr+2, wc+2, ≥Cout) narrow scratch — the caller's out
    # scratch) serializes the accumulation through memory, bounding
    # liveness to one piece's partial.
    if acc_ref is not None and nsrc > 1:
        # strip-mined over block rows: the loop body (one (S, wc, C)
        # strip through all pieces/taps) is traced ONCE, so both the
        # Mosaic code size and the register liveness stay O(strip)
        # instead of O(hr·wc) — at wc=127 the unrolled form took the
        # register allocator >25 min and was killed
        S = min(int(os.environ.get("PMC_TRUNK_STRIP", "8")), hr)

        def strip(si, _):
            base = si * S
            acc = None
            for p_i in range(nsrc):
                for P in range(3):
                    for Q in range(3):
                        xs = srcs[p_i][pl.ds(base + P, S),
                                       pl.ds(Q, wc), :]
                        t = dot(xs, wm(p_i, P, Q))
                        acc = t if acc is None else acc + t
            acc_ref[pl.ds(base + 1, S), pl.ds(1, wc), :] = acc
            return 0

        lax.fori_loop(0, hr // S, strip, 0)
        for r0 in range((hr // S) * S, hr):   # static tail rows
            strip_one = None
            for p_i in range(nsrc):
                for P in range(3):
                    for Q in range(3):
                        t = dot(srcs[p_i][r0 + P:r0 + P + 1,
                                          Q:Q + wc, :],
                                wm(p_i, P, Q))
                        strip_one = (t if strip_one is None
                                     else strip_one + t)
            acc_ref[r0 + 1:r0 + 2, 1:wc + 1, :] = strip_one
        y = acc_ref[1:hr + 1, 1:wc + 1, :]
    else:
        y = None
        for p_i in range(nsrc):
            for P in range(3):
                for Q in range(3):
                    t = dot(srcs[p_i][P:P + hr, Q:Q + wc, :],
                            wm(p_i, P, Q))
                    y = t if y is None else y + t

    if learned:
        # every band = the same 9-tap structure with that edge's
        # weights, evaluated at a shifted block position (module
        # docstring). Indices are into the padded scratch (+1 offset).
        def conv_row(widx, i):
            out = None
            for p_i in range(nsrc):
                for P in range(3):
                    for Q in range(3):
                        t = dot(srcs[p_i][i + P, Q:Q + wc, :],
                                wb(p_i, widx, P, Q))
                        out = t if out is None else out + t
            return out

        def conv_col(widx, j):
            out = None
            for p_i in range(nsrc):
                for P in range(3):
                    for Q in range(3):
                        t = dot(srcs[p_i][P:P + hr, j + Q, :],
                                wb(p_i, widx, P, Q))
                        out = t if out is None else out + t
            return out

        def conv_blk(widx, i, j):
            out = None
            for p_i in range(nsrc):
                for P in range(3):
                    for Q in range(3):
                        t = dot(srcs[p_i][i + P, j + Q:j + Q + 1, :],
                                wb(p_i, widx, P, Q))
                        out = t if out is None else out + t
            return out

        # packed slots (_band_slots): 2 = left⊕right cols, 3/4 = the
        # bottom/top corner pairs. Each member's live output lanes are
        # disjoint, so one streamed matrix serves both; the use sites
        # mask out the co-member's garbage (aligned: b01/b23 masks;
        # ragged: HIGHEST-precision un-park matmuls via ``uext_ref``).
        top_row = conv_row(0, hr - 2)      # values at block row hr-2
        bot_row = conv_row(1, 1)           # values at block row 1
        mask_b01 = perm_ref[0][None, :]     # (1, C)
        mask_b23 = perm_ref[1][None, :]
        left_col = conv_col(2, 0) * mask_b01

        if ragged is None:
            right_col = conv_col(2, wc - 1) * mask_b23
            c_bl = conv_blk(3, hr - 2, 0) * mask_b01
            c_br = conv_blk(3, hr - 2, wc - 1) * mask_b23
            c_tl = conv_blk(4, 1, 0) * mask_b01
            c_tr = conv_blk(4, 1, wc - 1) * mask_b23

            # ---- assembly: block-row concats + lane-group selects ----
            top0 = c_bl + top_row[0:1] * mask_b23
            topW = c_br + top_row[wc - 1:wc] * mask_b01
            top_full = jnp.concatenate(
                [top0, top_row[1:wc - 1], topW], axis=0)
            bot0 = c_tl + bot_row[0:1] * mask_b23
            botW = c_tr + bot_row[wc - 1:wc] * mask_b01
            bot_full = jnp.concatenate(
                [bot0, bot_row[1:wc - 1], botW], axis=0)

            left_fix = (left_col[1:hr - 1]
                        + y[1:hr - 1, 0] * mask_b23)
            right_fix = (right_col[1:hr - 1]
                         + y[1:hr - 1, wc - 1] * mask_b01)
            ymid = jnp.concatenate(
                [jnp.expand_dims(left_fix, 1), y[1:hr - 1, 1:wc - 1],
                 jnp.expand_dims(right_fix, 1)], axis=1)
            y = jnp.concatenate(
                [top_full[None], ymid, bot_full[None]], axis=0)
        else:
            # ---- ragged last block col (_ragged_plan / _band_slots):
            # right-edge values are parked on their own lane groups;
            # per-(eval, target) un-park matrices move them to the true
            # target lanes (and mask everything else) in one exact
            # 0/1-matrix dot — f32 HIGHEST, like the GN statistics
            t_list = ragged["targets"]
            t0 = t_list[0][0]

            def unpark(x, u_idx):
                return lax.dot_general(
                    x, uext_ref[u_idx],
                    (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                    precision=lax.Precision.HIGHEST)

            rcols = [conv_col(2, e) for e in ragged["evals"]]
            c_bl = conv_blk(3, hr - 2, 0) * mask_b01
            c_tl = conv_blk(4, 1, 0) * mask_b01
            c_brs = [conv_blk(3, hr - 2, e) for e in ragged["evals"]]
            c_trs = [conv_blk(4, 1, e) for e in ragged["evals"]]

            def row_assemble(row_vals, corner0, corners):
                parts = [corner0 + row_vals[0:1] * mask_b23]
                if t0 > 1:
                    parts.append(row_vals[1:t0])
                prev = t0
                for (t, keep_row, ssel) in t_list:
                    if t > prev:
                        parts.append(row_vals[prev:t])
                    v = row_vals[t:t + 1] * perm_ref[keep_row][None, :]
                    for (ei, u_idx) in ssel:
                        v = v + unpark(corners[ei], u_idx)
                    parts.append(v)
                    prev = t + 1
                if prev < wc:
                    parts.append(row_vals[prev:wc])
                return jnp.concatenate(parts, axis=0)

            top_full = row_assemble(top_row, c_bl, c_brs)
            bot_full = row_assemble(bot_row, c_tl, c_trs)

            left_fix = (left_col[1:hr - 1]
                        + y[1:hr - 1, 0] * mask_b23)
            mid_parts = [jnp.expand_dims(left_fix, 1)]
            if t0 > 1:
                mid_parts.append(y[1:hr - 1, 1:t0])
            prev = t0
            for (t, keep_row, ssel) in t_list:
                if t > prev:
                    mid_parts.append(y[1:hr - 1, prev:t])
                v = y[1:hr - 1, t] * perm_ref[keep_row][None, :]
                for (ei, u_idx) in ssel:
                    v = v + unpark(rcols[ei][1:hr - 1], u_idx)
                mid_parts.append(jnp.expand_dims(v, 1))
                prev = t + 1
            if prev < wc:
                mid_parts.append(y[1:hr - 1, prev:wc])
            ymid = jnp.concatenate(mid_parts, axis=1)
            y = jnp.concatenate(
                [top_full[None], ymid, bot_full[None]], axis=0)

    def _mask_pad(y):
        # zero the pad lane groups of the boundary block col and every
        # trailing all-pad block col: keeps the stored-field invariant
        # (pads exactly 0) and makes the GroupNorm sums exact over the
        # valid W columns
        pad_keep = perm_ref[ragged["pad_row"]][None, None, :]
        eb = ragged["eb"]
        parts = [y[:, :eb], y[:, eb:eb + 1] * pad_keep]
        if eb + 1 < wc:
            parts.append(jnp.zeros_like(y[:, eb + 1:]))
        return jnp.concatenate(parts, axis=1)

    y = y + bias_row[None, None, :]
    if ragged is not None:
        y = _mask_pad(y)

    if use_gn:
        # ---- GroupNorm over original channels (matmul statistics) ----
        n = jnp.asarray(float(H * (W_valid if W_valid is not None
                                   else W) * (co // groups)), acc_dtype)
        s1 = jnp.sum(y, axis=(0, 1))[None]             # (1, C)
        s2 = jnp.sum(y * y, axis=(0, 1))[None]
        # statistics dots at full f32 precision: the 0/1 matrices are
        # exact but casting the sums(-of-squares) to bf16 MXU inputs
        # loses 8 mantissa bits where GroupNorm amplifies them
        hp = lax.Precision.HIGHEST
        g1 = dot(s1, gmat_ref[:], hp)                  # (1, G)
        g2 = dot(s2, gmat_ref[:], hp)
        mean_g = g1 / n
        var_g = g2 / n - mean_g * mean_g
        inv_g = lax.rsqrt(var_g + 1e-5)
        mean_c = dot(mean_g, gmat_t_ref[:], hp)        # (1, C)
        inv_c = dot(inv_g, gmat_t_ref[:], hp)
        y = (y - mean_c[0][None, None, :]) * inv_c[0][None, None, :]
        # the affine is zeroed on padded channels, so they come out
        # exactly 0 and GELU keeps them 0
        y = y * gns_row[None, None, :] + gnb_row[None, None, :]
    if use_act:
        y = act(y)
    if ragged is not None and use_gn:
        # the GN affine re-polluted the pad lanes ((0-mean)·inv·s + b);
        # restore the exact-zero invariant (act(0) == 0, so the
        # use_gn=False thin merges only need the post-bias mask above)
        y = _mask_pad(y)
    return y


def _pool_op(src, prow_ref, pcol_ref, pmat_ref, *, hr, wc_in, acc_dtype):
    """Factor-2 average pool of the haloed scratch's interior in block
    layout: parity picks as 0/1 sublane matmuls (cols-then-rows so the
    result lands directly in (hr2, wc2, C) — no Mosaic transpose), the
    2×2→lane mean as a lane matmul. Default precision: every conv
    already passes activations through bf16, so the pool picks add no
    new noise class (CPU interpret stays exact f32).

    ``wc_in`` may be wc+1 (one zero halo col) when the pooled ragged
    layout needs an extra source block col (2·wc2 > wc)."""
    yin = src[1:hr + 1, 1:1 + wc_in, :]
    acc = None
    for j in (0, 1):
        t = lax.dot_general(pcol_ref[j], yin,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=acc_dtype)
        for i in (0, 1):                     # t: (wc2, hr, C)
            u = lax.dot_general(prow_ref[i], t,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=acc_dtype)
            v = lax.dot_general(u, pmat_ref[2 * i + j],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=acc_dtype)
            acc = v if acc is None else acc + v
    return acc


def _stack_kernel(*refs, R, hr, wc, co, groups, act, learned,
                  acc_dtype, pool, use_gn=True, use_act=True,
                  W_valid=None, ragged=None, pool_geom=None,
                  has_uext=False):
    """One grid step = one FluidLayer on the VMEM-resident field.

    All channel dims are host-padded to a common lane size C (Mosaic
    forbids lane-dim slices not aligned to the 128 tiling); padded
    channels carry exact zeros through conv -> zeroed-affine GN -> GELU.

    With ``pool``, the kernel additionally emits the factor-2 average
    pool of its INPUT field as a second (haloed) output at r==0 — the
    next pyramid level's input, computed in VMEM so the level chain
    never round-trips through XLA pooling (strided slices on the block
    dims lower to unsupported gathers / costly relayouts).

    ``use_gn``/``use_act`` statically drop the GroupNorm / activation
    tail (the thin merge-2/3 stacks).
    """
    ncst = 8 + int(has_uext) + (3 if pool else 0)
    consts = refs[:ncst]
    (wmain_ref, wband_ref, bias_ref, gns_ref, gnb_ref, gmat_ref,
     gmat_t_ref, perm_ref) = consts[:8]
    uext_ref = consts[8] if has_uext else None
    if pool:
        prow_ref, pcol_ref, pmat_ref = consts[8 + int(has_uext):]
    rest = refs[ncst:]
    x_hbm = rest[0]
    if pool:
        out_hbm, out2_hbm, src, scr2, sem, sem2 = rest[1:]
    else:
        out_hbm, src, sem = rest[1:]
    r = pl.program_id(0)

    # whole-buffer DMAs only (module docstring: the halo travels with
    # the field)
    @pl.when(r == 0)
    def _load():
        dma = pltpu.make_async_copy(x_hbm, src, sem)
        dma.start()
        dma.wait()

    if pool:
        @pl.when(r == 0)
        def _pool():
            hr2, wc2, wc_in, pool_mask_row, eb2 = pool_geom
            acc = _pool_op(src, prow_ref, pcol_ref, pmat_ref,
                           hr=hr, wc_in=wc_in, acc_dtype=acc_dtype)
            if pool_mask_row is not None or eb2 + 1 < wc2:
                # pooled ragged layout: zero the pad lane groups of
                # the pooled boundary block col (torch floor pooling
                # drops the trailing odd col — without this the
                # half-sum of the last valid col would leak into the
                # pad lane) and the trailing all-pad block cols (the
                # same half-sum leak lands in their first lane group
                # when W is odd and the boundary block is full)
                pk = (perm_ref[pool_mask_row][None, None, :]
                      if pool_mask_row is not None else 1.0)
                parts = [acc[:, :eb2], acc[:, eb2:eb2 + 1] * pk]
                if eb2 + 1 < wc2:
                    parts.append(jnp.zeros_like(acc[:, eb2 + 1:]))
                acc = jnp.concatenate(parts, axis=1)
            scr2[:] = jnp.zeros_like(scr2)
            scr2[1:hr2 + 1, 1:wc2 + 1, :] = acc
            dma = pltpu.make_async_copy(scr2, out2_hbm, sem2)
            dma.start()
            dma.wait()

    y = _fluid_layer_op(
        [src], lambda p, P, Q: wmain_ref[0, P, Q],
        lambda p, i, P, Q: wband_ref[0, i, P, Q],
        bias_ref[r], gns_ref[r], gnb_ref[r], gmat_ref, gmat_t_ref,
        perm_ref, hr=hr, wc=wc, co=co, groups=groups, act=act,
        learned=learned, acc_dtype=acc_dtype, use_gn=use_gn,
        use_act=use_act, W_valid=W_valid, ragged=ragged,
        uext_ref=uext_ref)

    src[1:hr + 1, 1:wc + 1, :] = y

    @pl.when(r == R - 1)
    def _store():
        dma = pltpu.make_async_copy(src, out_hbm, sem)
        dma.start()
        dma.wait()


class LayerStack:
    """Compiled megakernel for a uniform stack of FluidLayers on the
    fr=2 × fc=4 block layout.

    layers: list of dicts with keys ``w`` (k,k,Ci,Co dense HWIO),
    ``bias`` (Co,), ``gn_scale``/``gn_bias`` (Co,), and (learned) the 8
    BLC band kernels named as in the Flax params. All layers must share
    Ci == Co except a single-layer stack (the stem).

    ``__call__`` takes and returns the (hr, wc, fr·fc·C) block-layout
    activation (see ops/s2d.py space_to_depth_rect).
    """

    def __init__(self, layers: List[dict], H: int, W: int,
                 k: int, act, learned: bool, dtype=jnp.float32,
                 interpret: bool = False, pool: bool = False,
                 use_gn: bool = True, use_act: bool = True,
                 groups: int = None, weights_bf16: bool = None):
        assert k == 5, "band width 2 requires k=5"
        assert H % FR == 0
        if pool:
            assert H % (2 * FR) == 0
        R = len(layers)
        ci = layers[0]["w"].shape[2]
        co = layers[0]["w"].shape[3]
        assert R == 1 or ci == co, "uniform stacks only (except stem)"
        # W need not divide FC: a ragged last block col is handled via
        # _ragged_plan (pad lanes stay exact zeros; right-edge bands
        # get per-eval folded weight copies + target lane masks).
        # wc always runs at a sublane multiple (_round8) — trailing
        # all-pad block cols are cheaper than odd-size sublane slices.
        hr, wc = H // FR, _round8(-(-W // FC))
        assert hr >= 3 and wc >= 3, "assembly needs >=3 block rows/cols"
        fci, fco = FR * FC * ci, FR * FC * co
        # Mosaic forbids lane-dim slices not aligned to the 128 tiling,
        # so every channel axis is zero-padded to one common lane size C
        # and all kernel accesses use the full lane dim. Padded channels
        # stay exactly 0 (zero weights in, zeroed GN affine out).
        C = max(fci, fco)
        self.shape_in = (hr, wc, fci)
        self.shape_out = (hr, wc, fco)
        self._C = C
        dtype = np.dtype(dtype)

        def padded(a, shape):
            out = np.zeros(shape, dtype)
            out[tuple(slice(0, s) for s in a.shape)] = a
            return out

        wmain = np.stack([
            padded(s2d_conv_weights_rect(l["w"], FR, FC), (3, 3, C, C))
            for l in layers])
        bias = np.stack([padded(np.tile(np.asarray(l["bias"]), FR * FC),
                                (C,)) for l in layers])
        gns = np.stack([padded(np.tile(np.asarray(l["gn_scale"]),
                                       FR * FC), (C,)) for l in layers])
        gnb = np.stack([padded(np.tile(np.asarray(l["gn_bias"]),
                                       FR * FC), (C,)) for l in layers])
        P23, P01, m01, m23 = _lane_shift_mats(co, C)
        plan = _ragged_plan(W, co, C, wc_run=wc)
        if learned:
            # fold the output-lane permutation into the col-band and
            # corner weights, then SUM each packed slot's members (their
            # live output lanes are disjoint — _band_slots): dots land
            # directly on target/park lanes and only 5 (3,3,C,C)
            # matrices stream per layer instead of one per source.
            slots = _band_slots(plan, P23, P01)
            wband = np.stack([
                np.stack([
                    sum(padded(s2d_conv_weights_rect(np.asarray(l[nm]),
                                                     FR, FC),
                               (3, 3, C, C))
                        @ (np.eye(C, dtype=np.float32) if fold is None
                           else fold)
                        for nm, fold in members)
                    for members in slots])
                for l in layers])      # (R, 5, 3, 3, C, C)
        else:
            wband = np.zeros((R, 1, 3, 3, 1, 1), dtype)

        # measurement knob (PERF.md "band-weight footprint"): tile the
        # band-slot dim with unused zero slots so the per-layer streamed
        # bytes scale by the factor with NO compute change — the
        # steps/s delta isolates the pure weight-streaming cost that a
        # sparsity-compacted band layout could at best win back.
        probe = int(os.environ.get("PMC_BAND_STREAM_PROBE", "1"))
        if probe > 1 and learned:
            wband = np.concatenate(
                [wband] + [np.zeros_like(wband)] * (probe - 1), axis=1)

        if groups is None:
            groups = max(1, co // min(4, co))
        gmat, gmat_t = _group_mats(co, groups, C)

        # ---- pool geometry (torch floor semantics: W2 = W // 2) ----
        pool_mask = None
        pool_geom = None
        if pool:
            H2, W2 = H // 2, W // 2
            hr2, wc2 = H2 // FR, _round8(-(-W2 // FC))
            eb2 = -(-W2 // FC) - 1            # pooled boundary block
            # pool sources beyond the (haloed) scratch width do not
            # exist — pcol rows for them stay zero (those pooled cols
            # are all-pad anyway)
            wc_in = min(max(wc, 2 * wc2), wc + 1)
            w_rem2 = W2 - eb2 * FC
            if w_rem2 != FC:
                pool_mask = np.zeros((C,), np.float32)
                for a in range(FR):
                    for b in range(w_rem2):
                        lo = (a * FC + b) * ci
                        pool_mask[lo:lo + ci] = 1.0
        # lane keep-masks: rows 0/1 = [b∈{0,1}, b∈{2,3}] (padded lanes
        # are in neither mask — they stay whatever the main conv made
        # them, exact zeros); ragged plans append pad/keep rows and
        # stack the un-park extraction matrices
        perm, ragged, pool_mask_row, uexts = _perm_rows(plan, m01, m23,
                                                        pool_mask)
        has_uext = learned and uexts is not None
        if pool:
            pool_geom = (hr2, wc2, wc_in, pool_mask_row, eb2)
        kern = functools.partial(
            _stack_kernel, R=R, hr=hr, wc=wc, co=co,
            groups=groups, act=act, learned=learned, acc_dtype=dtype,
            pool=pool, use_gn=use_gn, use_act=use_act,
            W_valid=W, ragged=ragged, pool_geom=pool_geom,
            has_uext=has_uext)

        in_specs = [
            pl.BlockSpec((1,) + wmain.shape[1:],
                         lambda r: (r, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + wband.shape[1:],
                         lambda r: (r, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (R, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gn scale
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gn bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # group matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),   # group matrix.T
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lane masks
        ]
        if has_uext:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape = jax.ShapeDtypeStruct((hr + 2, wc + 2, C), dtype)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((hr + 2, wc + 2, C), dtype),
                   pltpu.SemaphoreType.DMA(())]
        pool_consts = ()
        if pool:
            prow = np.zeros((2, hr2, hr), np.float32)
            pcol = np.zeros((2, wc2, wc_in), np.float32)
            for par in (0, 1):
                prow[par, np.arange(hr2), 2 * np.arange(hr2) + par] = 1.0
                js = np.arange(wc2)
                sc = 2 * js + par
                ok = sc < wc_in
                pcol[par, js[ok], sc[ok]] = 1.0
            from .s2d import _pool_lane_mats
            pm = _pool_lane_mats(co)
            pmat = np.zeros((4, C, C), np.float32)
            n8 = FR * FC * co
            for i in (0, 1):
                for j in (0, 1):
                    pmat[2 * i + j, :n8, :n8] = pm[(i, j)]
            pool_consts = (prow.astype(dtype), pcol.astype(dtype),
                           pmat.astype(dtype))
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((hr2 + 2, wc2 + 2, C),
                                              dtype))
            out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                         pl.BlockSpec(memory_space=pl.ANY))
            scratch.append(pltpu.VMEM((hr2 + 2, wc2 + 2, C), dtype))
            scratch.append(pltpu.SemaphoreType.DMA(()))

        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # x (HBM)
        # scratch order: src, [scr2], sem, [sem2] — match kernel unpack
        if pool:
            scratch = [scratch[0], scratch[2], scratch[1], scratch[3]]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(R,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        self._call = pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )
        self._hr, self._wc = hr, wc
        self._wc_nat = -(-W // FC)
        self.pool = pool
        self._pool_consts = pool_consts
        # kept as NumPy: LayerStack may be built lazily inside a jit
        # trace (fast_path defers the host-side weight transforms), and
        # jnp constants created there would leak tracers across traces.
        # On TPU the conv weights are stored in bf16 — the step is
        # weight-streaming-bound at f32 across the level stacks, and
        # default MXU precision truncates f32 operands to bf16 anyway,
        # so this halves the bandwidth bit-identically. Interpret mode
        # (CPU tests) keeps exact f32 unless ``weights_bf16`` forces
        # the TPU storage dtype (the CI deviation-bound tests).
        if weights_bf16 is None:
            weights_bf16 = not interpret
        wdt = np.dtype(jnp.bfloat16) if weights_bf16 else dtype
        self._consts = (wmain.astype(wdt), wband.astype(wdt),
                        bias.astype(dtype), gns.astype(dtype),
                        gnb.astype(dtype), gmat.astype(dtype),
                        gmat_t.astype(dtype), perm.astype(dtype))
        if has_uext:
            # the un-park matrices stay f32: their dots run at HIGHEST
            # precision so the extraction is exact (like the GN stats)
            self._consts += (uexts.astype(np.float32),)

    def prep(self, x6):
        """Zero-halo + channel-pad a (hr, ≥wc_nat, fr·fc·Ci) activation
        into the raw kernel input layout (hr+2, wc+2, C); narrower
        inputs gain trailing zero block cols up to the run width."""
        fci = self.shape_in[-1]
        return jnp.pad(x6, ((1, 1), (1, self._wc - x6.shape[1] + 1),
                            (0, self._C - fci)))

    def call_raw(self, xh):
        """Run on a raw haloed input (hr+2, wc+2, C) — e.g. the previous
        stack's raw output or its in-kernel pooled second output (halo
        zeros are preserved by the kernel, so chained stacks skip the
        XLA pad/slice round-trips). Returns the raw haloed output, plus
        the haloed pooled input when ``pool``."""
        return self._call(*self._consts, *self._pool_consts, xh)

    def __call__(self, x6):
        """x6: (hr, ceil(W/FC), fr·fc·Ci) block-layout activation;
        returns the same natural width (trailing pad blocks dropped)."""
        hr = self._hr
        fco = self.shape_out[-1]
        out = self.call_raw(self.prep(x6))
        y = out[0] if self.pool else out
        return y[1:hr + 1, 1:self._wc_nat + 1, :fco]
