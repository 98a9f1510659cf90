"""Merge-trunk Pallas kernel: in-kernel bicubic upsampling + the
merge-1 convolution (87→16) with its boundary bands, GN0 and GELU.

Replaces the XLA stage between the branch kernels and merges 2/3:
bicubic resize of each coarse branch (dense matmuls), the rect-s2d
relayouts of the resized fields, the halo/lane pads, and the lane
concat — together ~0.3 ms of copies/fusions per step at 256²
(PERF.md round-2 profile). Here the kernel takes the RAW haloed branch
outputs and:

* resizes each coarse level to full resolution in VMEM, in block
  layout: 4× upsampling is position matmuls on the block dims (the
  same Keys-kernel matrices as ops/resize.py, split by block parity)
  plus lane-group permutation matmuls — cols-then-rows so no Mosaic
  transpose (the pool trick, branch_kernel._pool_op);
* writes each resized piece into its own narrow (128-lane) haloed
  scratch — narrow scratches tile (1,128), so interior stores are
  legal (a single wide trunk scratch would tile (8,128) and forbid
  them), and the lane concat never materializes: the merge conv sums
  per-piece dots (branch_kernel._fluid_layer_op multi-src);
* runs merge-1 = conv + BLC bands + bias + GN0 + GELU in the same
  kernel and DMAs the raw haloed (hr+2, wc+2, 128) result out (merges
  2/3 chain on it as ordinary LayerStacks).

Exactness: bit-equal to the XLA stage in f32 (CPU interpret tests);
on TPU the dots run at the same default MXU precision as everything
else. Reference: pytorch_networks_convae.py:266-475 (branch merge),
:1227-1229 (bicubic upsample).
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .branch_kernel import (
    FR, FC, _band_slots, _fluid_layer_op, _group_mats,
    _lane_shift_mats, _perm_rows, _ragged_plan, _round8)
from .resize import _resize_matrix_np
from .s2d import s2d_conv_weights_rect


def _row_lane_perms(c, C):
    """(4, C, C): j = a·2 + r moves lane group (r, b, cc) → (a, b, cc),
    zeroing all other output lanes."""
    P = np.zeros((4, C, C), np.float32)
    for a in range(FR):
        for r in range(FR):
            for b in range(FC):
                for cc in range(c):
                    P[a * 2 + r, (r * FC + b) * c + cc,
                      (a * FC + b) * c + cc] = 1.0
    return P


def _col_lane_perms(c, C):
    """(16, C, C): k = b'·4 + s moves lane group (r, s, cc) →
    (r, b', cc)."""
    P = np.zeros((16, C, C), np.float32)
    for bp in range(FC):
        for s in range(FC):
            for r in range(FR):
                for cc in range(c):
                    P[bp * 4 + s, (r * FC + s) * c + cc,
                      (r * FC + bp) * c + cc] = 1.0
    return P


def _trunk_kernel(*refs, nlev, grids, co, groups, act, learned,
                  acc_dtype, W_valid=None, ragged=None,
                  has_uext=False):
    """grids[l] = (hr_l, wc_l); level 0 is full resolution."""
    (wmain_ref, wband_ref, bias_ref, gns_ref, gnb_ref, gmat_ref,
     gmat_t_ref, perm_ref, prow_ref, pcol_ref) = refs[:10]
    uext_ref = refs[10] if has_uext else None
    k1 = 10 + int(has_uext)
    ncoarse = nlev - 1
    ars = refs[k1:k1 + ncoarse]
    bcs = refs[k1 + ncoarse:k1 + 2 * ncoarse]
    k0 = k1 + 2 * ncoarse
    xs_hbm = refs[k0:k0 + nlev + 1]        # b0, out_1..4, x
    out_hbm = refs[k0 + nlev + 1]
    srcs = refs[k0 + nlev + 2:k0 + 2 * nlev + 3]   # nlev+1 pieces
    ins = refs[k0 + 2 * nlev + 3:k0 + 3 * nlev + 2]  # ncoarse small
    scr_out = refs[-2]
    sem = refs[-1]
    hr, wc = grids[0]

    # start ALL input DMAs up front (each on its own semaphore), then
    # wait per buffer just before first use — the transfers overlap
    # each other and the coarse-level upsampling instead of running as
    # 7 serialized start/wait pairs
    dmas = []
    for i, (src_hbm, dst) in enumerate(
            [(xs_hbm[0], srcs[0]), (xs_hbm[nlev], srcs[nlev])]
            + [(xs_hbm[l], ins[l - 1]) for l in range(1, nlev)]):
        d = pltpu.make_async_copy(src_hbm, dst, sem.at[i])
        d.start()
        dmas.append(d)

    for l in range(1, nlev):
        dmas[1 + l].wait()
        hrl, wcl = grids[l]
        yin = ins[l - 1][1:hrl + 1, 1:wcl + 1, :]
        # cols: out dense col 4q+b' = Σ B[4q+b', 4qi+s]*in[.., 4qi+s]
        t2 = None
        for bp in range(FC):
            for s in range(FC):
                u = lax.dot_general(
                    bcs[l - 1][bp * 4 + s], yin,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype)  # (wc, hrl, C)
                u = lax.dot_general(
                    u, pcol_ref[bp * 4 + s],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
                t2 = u if t2 is None else t2 + u
        # rows: out dense row 2p+a = Σ A[2p+a, 2pi+r]·t2[.., 2pi+r]
        out = None
        for a in range(FR):
            for r in range(FR):
                v = lax.dot_general(
                    ars[l - 1][a * 2 + r], t2,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype)  # (hr, wc, C)
                v = lax.dot_general(
                    v, prow_ref[a * 2 + r],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
                out = v if out is None else out + v
        srcs[l][:] = jnp.zeros_like(srcs[l])
        srcs[l][1:hr + 1, 1:wc + 1, :] = out

    dmas[0].wait()     # b0 — consumed by the merge conv below
    dmas[1].wait()     # x

    # acc_ref=scr_out: serialize the 6-piece main-conv accumulation
    # through the output scratch — one long value chain here spills
    # ~85 MB of vregs at 128×506 (measured: over physical VMEM)
    y = _fluid_layer_op(
        list(srcs), lambda p, P, Q: wmain_ref[p, P, Q],
        lambda p, i, P, Q: wband_ref[p, i, P, Q],
        bias_ref[0], gns_ref[0], gnb_ref[0], gmat_ref, gmat_t_ref,
        perm_ref, hr=hr, wc=wc, co=co, groups=groups, act=act,
        learned=learned, acc_dtype=acc_dtype, W_valid=W_valid,
        ragged=ragged, acc_ref=scr_out, uext_ref=uext_ref)

    scr_out[:] = jnp.zeros_like(scr_out)
    scr_out[1:hr + 1, 1:wc + 1, :] = y
    dma = pltpu.make_async_copy(scr_out, out_hbm, sem.at[0])
    dma.start()
    dma.wait()


class TrunkStack:
    """Compiled merge-trunk kernel (see module docstring).

    ``layer``: the merge-1 layer dict (w (5,5,c_cat,c_h), bias, the 8
    BLC band kernels, gn_scale/gn_bias from GN0); ``c_ps``: per-piece
    dense channel counts [c_h]·levels + [c_i].

    ``__call__(b0_raw, out1_raw, …, x_raw)`` takes the raw haloed
    block-layout pieces — full-res for b0/x, each coarse level at its
    own grid — and returns the raw haloed (hr+2, wc+2, 8·c_h) merge-1
    output (post GN0 + activation).
    """

    def __init__(self, layer: dict, c_ps: List[int], H: int, W: int,
                 nlev: int, k: int, act, learned: bool,
                 dtype=jnp.float32, interpret: bool = False,
                 groups: int = None, weights_bf16: bool = None):
        assert k == 5
        c_cat = sum(c_ps)
        co = layer["w"].shape[3]
        assert layer["w"].shape[2] == c_cat
        C = 128
        assert all(FR * FC * c <= C for c in c_ps)
        dtype = np.dtype(dtype)
        grids = []
        wls = []
        for l in range(nlev):
            # valid level sizes follow the torch floor-pool chain;
            # block-col counts run at the same _round8 width as the
            # branch kernels producing each piece (pad lanes and
            # trailing pad blocks carry exact zeros —
            # branch_kernel._ragged_plan)
            Hl, Wl = H // 2 ** l, W // 2 ** l
            grids.append((Hl // FR, _round8(-(-Wl // FC))))
            wls.append(Wl)
        hr, wc = grids[0]
        npieces = nlev + 1                 # levels + the input field
        fco = FR * FC * co

        # split the standard rect-s2d weights into per-piece 128-lane
        # chunks: chunk p row (a·4+b)·c_p + cp ← std row
        # (a·4+b)·c_cat + off_p + cp
        offs = np.cumsum([0] + list(c_ps))

        def chunks(w_std):
            out = np.zeros((npieces, 3, 3, C, fco), dtype)
            for p in range(npieces):
                cp = c_ps[p]
                for blk in range(FR * FC):
                    src_rows = blk * c_cat + offs[p] + np.arange(cp)
                    dst_rows = blk * cp + np.arange(cp)
                    out[p, :, :, dst_rows, :] = np.moveaxis(
                        w_std[:, :, src_rows, :], 2, 0)
            return out

        w_std = s2d_conv_weights_rect(layer["w"], FR, FC)
        wmain = chunks(w_std)
        P23, P01, m01, m23 = _lane_shift_mats(co, fco)
        plan = _ragged_plan(W, co, fco, wc_run=wc)
        if learned:
            # packed slots (branch_kernel._band_slots): each slot's
            # members land on disjoint output lanes and share one
            # streamed matrix per piece
            slots = _band_slots(plan, P23, P01)
            wband = np.stack([
                sum(chunks(s2d_conv_weights_rect(np.asarray(layer[nm]),
                                                 FR, FC))
                    @ (np.eye(fco, dtype=np.float32) if fold is None
                       else fold)
                    for nm, fold in members)
                for members in slots], axis=1)
            # (npieces, 5, 3, 3, C, fco)
        else:
            wband = np.zeros((npieces, 1, 3, 3, 1, 1), dtype)

        if groups is None:
            groups = max(1, co // min(4, co))
        gmat, gmat_t = _group_mats(co, groups, fco)
        perm, ragged, _, uexts = _perm_rows(plan, m01, m23)
        has_uext = learned and uexts is not None
        bias = np.tile(np.asarray(layer["bias"]), FR * FC)[None]
        gns = np.tile(np.asarray(layer["gn_scale"]), FR * FC)[None]
        gnb = np.tile(np.asarray(layer["gn_bias"]), FR * FC)[None]

        # resize consts: parity-split Keys matrices + lane perms
        prow = _row_lane_perms(c_ps[0], C)
        pcol = _col_lane_perms(c_ps[0], C)
        ars, bcs = [], []
        for l in range(1, nlev):
            hrl, wcl = grids[l]
            A = _resize_matrix_np(hrl * FR, H)     # (H, H_l)
            # the Keys matrix maps VALID widths; embed it in the
            # block-shaped matrix with zero rows/cols for pad lanes
            # (pad sources contribute nothing, pad targets stay 0)
            B = np.zeros((wc * FC, wcl * FC), np.float64)
            B[:W, :wls[l]] = _resize_matrix_np(wls[l], W)
            ar = np.zeros((4, hr, hrl), np.float64)
            for a in range(FR):
                for r in range(FR):
                    ar[a * 2 + r] = A[a::FR, r::FR]
            bc = np.zeros((16, wc, wcl), np.float64)
            for bp in range(FC):
                for s in range(FC):
                    bc[bp * 4 + s] = B[bp::FC, s::FC]
            ars.append(ar.astype(dtype))
            bcs.append(bc.astype(dtype))

        kern = functools.partial(
            _trunk_kernel, nlev=nlev, grids=tuple(grids), co=co,
            groups=groups, act=act, learned=learned, acc_dtype=dtype,
            W_valid=W, ragged=ragged, has_uext=has_uext)

        nconst = 10 + int(has_uext) + 2 * (nlev - 1)
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * nconst
            + [pl.BlockSpec(memory_space=pl.ANY)] * npieces)
        scratch = (
            [pltpu.VMEM((hr + 2, wc + 2, C), dtype)
             for _ in range(npieces)]
            + [pltpu.VMEM((g[0] + 2, g[1] + 2, C), dtype)
               for g in grids[1:]]
            + [pltpu.VMEM((hr + 2, wc + 2, fco), dtype),
               pltpu.SemaphoreType.DMA((npieces,))])
        self._call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((hr + 2, wc + 2, fco),
                                           dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(1,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=scratch,
            ),
            interpret=interpret,
        )
        if weights_bf16 is None:
            weights_bf16 = not interpret
        wdt = np.dtype(jnp.bfloat16) if weights_bf16 else dtype
        self._consts = tuple(
            [wmain.astype(wdt), wband.astype(wdt), bias.astype(dtype),
             gns.astype(dtype), gnb.astype(dtype), gmat.astype(dtype),
             gmat_t.astype(dtype), perm.astype(dtype),
             prow.astype(dtype), pcol.astype(dtype)]
            + ([uexts.astype(np.float32)] if has_uext else [])
            + ars + bcs)
        self._grids = grids
        self._C = C
        self.shape_out = (hr, wc, fco)

    def __call__(self, *pieces):
        """pieces: raw haloed (b0, coarse_1..L-1, x) — b0/x at
        (hr+2, wc+2, 128), coarse l at (hr_l+2, wc_l+2, 128)."""
        return self._call(*self._consts, *pieces)
