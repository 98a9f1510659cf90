"""Rollout-optimized NewFluidNet execution via space-to-depth convs.

The flagship surrogate spends its time in 5×5 convolutions over 16
channels — ~12% MXU lane utilization. This module executes the *same*
parameters through an exact space-to-depth (f=4) reformulation
(ops/s2d.py): every interior conv becomes a 3×3 conv over 256 channels
(full MXU lanes, measured 3.3×), GroupNorm/activation stay in s2d layout,
and the learned-boundary bands are fixed up with 3 grouped convs instead
of 8 separate ones.

Exactness: outputs match ``NewFluidNet.apply`` to float round-off (tests).
Supported: r_p in {"learned", "zeros"}, bc_x = bc_y = 1, no dropout at
inference — the flagship rollout configuration. Other configurations use
the standard module.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.curl import blur3x3, curl_head_padded
from ..ops.resize import avg_pool_nhwc, resize_bicubic_nhwc
from ..ops.s2d import (
    conv_s2d, depth_to_space, group_norm_s2d, pad_to_multiple,
    s2d_conv_weights, s2d_valid_mask, space_to_depth)
from .layers import get_activation

_BLC_ORDER = ("conv_top_left", "conv_top_right", "conv_bottom_left",
              "conv_bottom_right", "conv_top", "conv_bottom", "conv_left",
              "conv_right")


@dataclasses.dataclass
class _FastLayer:
    """One FluidLayer's precomputed fast weights."""

    w_s2d: jnp.ndarray                    # (Kp,Kp,f²Ci,f²Co)
    gn_scale: jnp.ndarray
    gn_bias: jnp.ndarray
    num_groups: int
    c_o: int
    learned: bool
    k: int
    # learned-padding extras (dense HWIO band weights)
    bias: Optional[jnp.ndarray] = None            # learnable_bias (1,1,1,C)
    w_corners: Optional[jnp.ndarray] = None       # (k,k,Ci,4Co) grouped
    w_tb: Optional[jnp.ndarray] = None            # (k,k,Ci,2Co) top+bottom
    w_lr: Optional[jnp.ndarray] = None            # (k,k,Ci,2Co) left+right
    # plain-conv extras
    conv_bias: Optional[jnp.ndarray] = None


def _grouped(kernels: List[np.ndarray]) -> jnp.ndarray:
    """Stack same-shaped HWIO kernels along O for a feature-grouped conv
    (inputs are channel-concatenated copies of the same slab)."""
    return jnp.asarray(np.concatenate(kernels, axis=-1))


def _conv_valid(x, w, groups: int = 1):
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype)


def _prep_layer(tree: Dict, learned: bool, k: int, f: int, dtype
                ) -> _FastLayer:
    conv = tree["conv"]
    gn = tree["gn"]["GroupNorm_0"]
    if learned:
        w_main = np.asarray(conv["conv"]["kernel"], dtype)
        c_o = w_main.shape[-1]
        band = {n: np.asarray(conv[n]["kernel"], dtype)
                for n in _BLC_ORDER}
        return _FastLayer(
            w_s2d=jnp.asarray(s2d_conv_weights(w_main, f)),
            gn_scale=jnp.asarray(gn["scale"], dtype),
            gn_bias=jnp.asarray(gn["bias"], dtype),
            num_groups=max(1, c_o // min(4, c_o)),
            c_o=c_o, learned=True, k=k,
            bias=jnp.asarray(conv["learnable_bias"], dtype),
            w_corners=_grouped([band["conv_bottom_left"],
                                band["conv_bottom_right"],
                                band["conv_top_left"],
                                band["conv_top_right"]]),
            w_tb=_grouped([band["conv_bottom"], band["conv_top"]]),
            w_lr=_grouped([band["conv_left"], band["conv_right"]]),
        )
    w = np.asarray(conv["kernel"], dtype)
    c_o = w.shape[-1]
    return _FastLayer(
        w_s2d=jnp.asarray(s2d_conv_weights(w, f)),
        gn_scale=jnp.asarray(gn["scale"], dtype),
        gn_bias=jnp.asarray(gn["bias"], dtype),
        num_groups=max(1, c_o // min(4, c_o)),
        c_o=c_o, learned=False, k=k,
        conv_bias=jnp.asarray(conv["bias"], dtype),
    )


def _prep_plain_conv(tree: Dict, f: int, dtype):
    w = np.asarray(tree["kernel"], dtype)
    return (jnp.asarray(s2d_conv_weights(w, f)),
            jnp.asarray(tree["bias"], dtype), w.shape[-1])


def _prep_blc(tree: Dict, k: int, f: int, dtype):
    w_main = np.asarray(tree["conv"]["kernel"], dtype)
    band = {n: np.asarray(tree[n]["kernel"], dtype) for n in _BLC_ORDER}
    return dict(
        w_s2d=jnp.asarray(s2d_conv_weights(w_main, f)),
        bias=jnp.asarray(tree["learnable_bias"], dtype),
        w_corners=_grouped([band["conv_bottom_left"],
                            band["conv_bottom_right"],
                            band["conv_top_left"], band["conv_top_right"]]),
        w_tb=_grouped([band["conv_bottom"], band["conv_top"]]),
        w_lr=_grouped([band["conv_left"], band["conv_right"]]),
        c_o=w_main.shape[-1], k=k)


class FastNewFluidNet:
    """Exact fast executor for a trained NewFluidNet (see module doc).

    Usage::

        fast = FastNewFluidNet(model, params, H, W)
        u, v, p = fast(x)            # x: (B, H, W, c_i) dense NHWC
    """

    def __init__(self, model, params, H: int, W: int, f: int = 4,
                 dtype=None, conv_bf16: bool = False,
                 approx_gelu: bool = False, megakernel=None,
                 exact_gelu: bool = False,
                 mk_tpu_numerics: bool = False):
        """``conv_bf16``/``approx_gelu`` enable the fast-inexact mode:
        convolution inputs/weights in bfloat16 (f32 accumulation) and
        tanh-approximate GELU. Deviates from the reference's float64
        semantics at the ~1e-3 level — OFF by default.

        ``megakernel`` (default: auto — on for the TPU backend, off
        elsewhere; pass True to force the interpret-mode kernels on
        CPU) executes the network as 7 Pallas kernels on a rect
        fr=2 × fc=4 block layout: stem + one whole-branch kernel per
        pyramid level (activation VMEM-resident across ``repeats``
        layers, boundary bands/GroupNorm/GELU in-kernel, factor-2 pool
        of the next level's input as a second output —
        ops/branch_kernel.py), a merge-trunk kernel that upsamples the
        coarse branches in VMEM and runs merge-1 + GN0
        (ops/merge_kernel.py), and two thin merge stacks. Applies when
        B=1, k=5, factor=2, f=4, even row counts and ≥3 block
        rows/cols at every pyramid level — widths need not divide 4
        (ragged last block col, ops/branch_kernel._ragged_plan; the
        reference's 128×506 grid runs the kernels). Falls back to the
        standard fast path otherwise. Exact to f32 round-off vs the module (CPU tests);
        on TPU everything runs at the MXU's default bf16 precision,
        like the standard path's XLA convolutions."""
        self.m = model
        self.f = f
        self.H, self.W = H, W
        self.conv_bf16 = conv_bf16
        self.approx_gelu = approx_gelu
        # mk_tpu_numerics=True makes the CPU interpret kernels use the
        # TPU storage/activation numerics (bf16 conv weights + the
        # divide-free GELU fit) so CI can bound the shipped TPU path's
        # deviation without a chip; no effect on the TPU backend.
        self.mk_tpu_numerics = mk_tpu_numerics
        self.exact_gelu = exact_gelu
        p = params["params"] if "params" in params else params
        dtype = dtype or np.asarray(
            jax.tree.leaves(p)[0]).dtype
        self.dtype = dtype
        learned = model.r_p == "learned"
        if model.r_p not in ("learned", "zeros"):
            raise ValueError("fast path supports r_p in {learned, zeros}")
        if model.spectral_conv or model.drop_rate:
            raise ValueError("fast path: no spectral/dropout support")
        if model.use_symm or model.dilation != 1:
            raise ValueError(
                "fast path supports use_symm=False, dilation=1 (the "
                "symmetric-conv unique-weight layout is not transformed)")

        k = model.f
        self.stem = _prep_layer(p["conv_0"], learned, k, f, dtype)
        self.branches = [
            [_prep_layer(p[f"convs_{l}_{r}"], learned, k, f, dtype)
             for r in range(model.repeats)]
            for l in range(model.levels)]
        if learned:
            self.merge1 = _prep_blc(p["conv_1"], k, f, dtype)
            self.merge2 = _prep_blc(p["conv_2"], k, f, dtype)
            self.merge3 = _prep_blc(p["conv_3"], k, f, dtype)
        else:
            self.merge1 = _prep_plain_conv(p["conv_1"], f, dtype)
            self.merge2 = _prep_plain_conv(p["conv_2"], f, dtype)
            self.merge3 = _prep_plain_conv(p["conv_3"], f, dtype)
        gn0 = p["gn_0"]["GroupNorm_0"]
        self.gn0_scale = jnp.asarray(gn0["scale"], dtype)
        self.gn0_bias = jnp.asarray(gn0["bias"], dtype)
        if approx_gelu and model.act_fn == "gelu":
            self.act = lambda x: jax.nn.gelu(x, approximate=True)
        else:
            self.act = get_activation(model.act_fn)
        if conv_bf16:
            def _cast(lay):
                lay.w_s2d = lay.w_s2d.astype(jnp.bfloat16)
                return lay
            self.stem = _cast(self.stem)
            self.branches = [[_cast(l) for l in br]
                             for br in self.branches]
            if isinstance(self.merge1, dict):
                for spec in (self.merge1, self.merge2, self.merge3):
                    spec["w_s2d"] = spec["w_s2d"].astype(jnp.bfloat16)

        # ---- whole-branch megakernel path (ops/branch_kernel.py) ----
        # the kernel uses its own fr=2 x fc=4 block layout (8C lanes —
        # full 128-wide MXU at C=16); independent of this object's f
        explicit_mk = megakernel is True
        if megakernel is None:
            megakernel = jax.default_backend() == "tpu"

        def _mk_unsupported():
            """Megakernel precondition check (mirrors the LayerStack/
            TrunkStack asserts, evaluated eagerly): returns the reason
            string when the config can't run the kernels, else None."""
            from ..ops.branch_kernel import FR, FC
            if (jnp.dtype(dtype).itemsize > 4
                    and jax.default_backend() == "tpu"):
                # interpret mode (CPU tests) evaluates the kernels in
                # plain XLA and handles f64 fine
                return f"dtype={jnp.dtype(dtype).name} (Mosaic has no " \
                    "f64 vector path; f64 runs the standard fast path)"
            if k != 5:
                return f"kernel={k} (needs 5)"
            if model.factor != 2:
                return f"factor={model.factor} (needs 2)"
            if conv_bf16 or f != 4:
                return "conv_bf16/f override"
            if getattr(model, "bc_x", 1) != 1 or \
                    getattr(model, "bc_y", 1) != 1:
                return "bc_x/bc_y != 1"
            # TrunkStack packs each trunk piece into 128 lanes and
            # LayerStack pads channels to a common lane size — channel
            # counts above 16 exceed the 8·C = 128 lane budget
            if FR * FC * max(model.c_h, model.c_i) > 128:
                return (f"c_h={model.c_h}/c_i={model.c_i} "
                        f"(needs 8*max(c_h, c_i) <= 128)")
            # on real TPUs Mosaic only lowers the pool/assembly shape
            # casts when the lane dim is exactly the native 128 (c_h=8
            # → 64 lanes fails with "unsupported shape cast"); interpret
            # mode (CPU tests) has no such restriction
            if (jax.default_backend() == "tpu"
                    and FR * FC * model.c_h != 128):
                return (f"c_h={model.c_h} (TPU Mosaic needs the 8*c_h "
                        f"lane dim == 128)")
            # widths need NOT divide 4: ragged last block cols are
            # handled in-kernel (ops/branch_kernel._ragged_plan) — the
            # reference's own 128×506 production grid runs the kernels
            for l in range(model.levels):
                Hl, Wl = H // 2 ** l, W // 2 ** l
                hr, wc = Hl // FR, -(-Wl // FC)
                if Hl % FR or hr < 3 or wc < 3:
                    return f"level {l} grid {Hl}x{Wl} (rows must be " \
                        f"even, >=3 block rows/cols)"
                if l < model.levels - 1 and Hl % (2 * FR):
                    return f"level {l} rows {Hl} not poolable"
            return None

        reason = _mk_unsupported()
        if explicit_mk and reason is not None:
            raise ValueError(
                f"megakernel=True but the config is unsupported: "
                f"{reason}")
        self.use_megakernel = bool(megakernel and reason is None)
        if self.use_megakernel:
            def raw(tree):
                conv = tree["conv"]
                gn = tree["gn"]["GroupNorm_0"]
                d = {"gn_scale": np.asarray(gn["scale"], dtype),
                     "gn_bias": np.asarray(gn["bias"], dtype)}
                if learned:
                    d["w"] = np.asarray(conv["conv"]["kernel"], dtype)
                    d["bias"] = np.asarray(conv["learnable_bias"],
                                           dtype)[0, 0, 0]
                    for nm in _BLC_ORDER:
                        d[nm] = np.asarray(conv[nm]["kernel"], dtype)
                else:
                    d["w"] = np.asarray(conv["kernel"], dtype)
                    d["bias"] = np.asarray(conv["bias"], dtype)
                return d

            # stacks are built lazily on the first B=1 call (host-side
            # weight transforms are skipped when the fallback path runs)
            self._mk_params = p
            self._mk_raw_stem = [raw(p["conv_0"])]
            self._mk_raw_branches = [
                [raw(p[f"convs_{l}_{r}"]) for r in range(model.repeats)]
                for l in range(model.levels)]
            self.mk_stem = None
            self.mk_branches = None


    def _build_megakernel(self):
        from ..ops.branch_kernel import LayerStack

        m, k = self.m, self.m.f
        H, W = self.H, self.W
        learned = m.r_p == "learned"
        interp = jax.default_backend() != "tpu"   # Mosaic needs TPU
        tpu_num = not interp or self.mk_tpu_numerics
        wbf16 = True if (interp and self.mk_tpu_numerics) else None
        act = self.act
        if tpu_num and m.act_fn == "gelu" and not self.approx_gelu:
            # Mosaic has no erf primitive. Default: the divide-free
            # bf16-grade fit (|err| 1.5e-4 — an order below the MXU's
            # default-precision conv noise, ~2x fewer VPU ops);
            # exact_gelu=True restores XLA's own f32 erf polynomial.
            from ..ops.branch_kernel import (
                gelu_erf_kernel, gelu_fast_kernel)
            act = (gelu_erf_kernel if self.exact_gelu
                   else gelu_fast_kernel)
        self.mk_stem = LayerStack(
            self._mk_raw_stem, H, W, k, act=act,
            learned=learned, dtype=self.dtype, interpret=interp,
            weights_bf16=wbf16)
        self.mk_branches = []
        for l in range(m.levels):
            Hl, Wl = H // (2 ** l), W // (2 ** l)
            # each branch kernel also emits the factor-2 pool of its
            # input — the next level's input — computed in VMEM
            self.mk_branches.append(LayerStack(
                self._mk_raw_branches[l], Hl, Wl, k, act=act,
                learned=learned, dtype=self.dtype, interpret=interp,
                pool=l < m.levels - 1, weights_bf16=wbf16))

        # ---- merge stage as three kernels ----
        # the trunk is fed as lane-range pieces (VMEM lane concat);
        # the merge-1 conv carries the piece-major→standard input-lane
        # permutation; GN0+GELU ride merge-1's tail; merges 2/3 are
        # act-only / plain (use_gn/use_act flags)
        p = (self._mk_params)
        dtype = self.dtype

        def raw_merge(tree, gn_tree=None):
            if learned:
                d = {"w": np.asarray(tree["conv"]["kernel"], dtype),
                     "bias": np.asarray(tree["learnable_bias"],
                                        dtype)[0, 0, 0]}
                for nm in _BLC_ORDER:
                    d[nm] = np.asarray(tree[nm]["kernel"], dtype)
            else:
                d = {"w": np.asarray(tree["kernel"], dtype),
                     "bias": np.asarray(tree["bias"], dtype)}
            co = d["w"].shape[-1]
            if gn_tree is not None:
                d["gn_scale"] = np.asarray(gn_tree["scale"], dtype)
                d["gn_bias"] = np.asarray(gn_tree["bias"], dtype)
            else:
                d["gn_scale"] = np.ones(co, dtype)
                d["gn_bias"] = np.zeros(co, dtype)
            return d

        from ..ops.merge_kernel import TrunkStack
        c_ps = [m.c_h] * m.levels + [m.c_i]
        # merge-1 + in-kernel bicubic upsampling of the coarse branches
        # (ops/merge_kernel.py): consumes the RAW haloed branch outputs
        self.mkm1 = TrunkStack(
            raw_merge(p["conv_1"], p["gn_0"]["GroupNorm_0"]),
            c_ps, H, W, m.levels, k, act=act, learned=learned,
            dtype=self.dtype, interpret=interp,
            groups=max(1, m.c_h // 4), weights_bf16=wbf16)
        self.mkm2 = LayerStack(
            [raw_merge(p["conv_2"])], H, W, k, act=act,
            learned=learned, dtype=self.dtype, interpret=interp,
            use_gn=False, weights_bf16=wbf16)
        self.mkm3 = LayerStack(
            [raw_merge(p["conv_3"])], H, W, k, act=act,
            learned=learned, dtype=self.dtype, interpret=interp,
            use_gn=False, use_act=False, weights_bf16=wbf16)

    # ------------------------------------------------------------------
    # band fix-up machinery
    # ------------------------------------------------------------------

    def _dense_slabs(self, x6, C, n, H, W):
        """Dense top/bottom (n, W) and left/right (H, n) slabs of the
        valid region, extracted from edge blocks of the s2d tensor."""
        f = self.f
        h, w = x6.shape[1], x6.shape[2]
        nb = min(h, -(-n // f) + 1)      # block rows covering n valid rows
        nbw = min(w, -(-n // f) + 1)     # + up to f-1 pad rows at the end
        top = depth_to_space(x6[:, :nb], f, C)[:, :n, :W]
        bot_strip = depth_to_space(x6[:, h - nb:], f, C)
        off = H - (h - nb) * f           # valid rows inside the strip
        bot = bot_strip[:, off - n:off, :W]
        left = depth_to_space(x6[:, :, :nbw], f, C)[:, :H, :n]
        rgt_strip = depth_to_space(x6[:, :, w - nbw:], f, C)
        offw = W - (w - nbw) * f
        rgt = rgt_strip[:, :H, offw - n:offw]
        return top, bot, left, rgt

    def _blc_bands(self, x6, C, c_o, k, w_corners, w_tb, w_lr, H, W):
        """The 4 output bands of the learned-boundary conv
        (pytorch_networks_convae.py:1022-1060 semantics, incl. the
        row-flip quirk: output rows 0..1 come from the LAST input rows)."""
        pad = k + 1 if k == 5 else k
        slabs = self._dense_slabs(x6, C, pad, H, W)
        return self._bands_from_slabs(slabs, c_o, k, w_corners, w_tb,
                                      w_lr)

    def _bands_from_slabs(self, slabs, c_o, k, w_corners, w_tb, w_lr):
        """Band convolutions given precomputed dense edge slabs
        (top, bottom, left, right) of width pad — callers with
        non-dense trunk layouts (the f4p merge assembly) extract slabs
        from their pieces directly."""
        pad = k + 1 if k == 5 else k
        band = pad - (k - 1)
        top_in, bot_in, left_in, right_in = slabs

        # top+bottom grouped conv: output band rows; group 0 = dense rows
        # 0..band-1 (from bot_in), group 1 = last rows (from top_in)
        tb_in = jnp.concatenate([bot_in, top_in], axis=-1)
        tb = _conv_valid(tb_in, w_tb, groups=2)          # (B, band, W-k+1, 2c_o)
        lr_in = jnp.concatenate([left_in, right_in], axis=-1)
        lr = _conv_valid(lr_in, w_lr, groups=2)          # (B, H-k+1, band, 2c_o)

        cn_in = jnp.concatenate(
            [bot_in[:, :, :pad], bot_in[:, :, -pad:],
             top_in[:, :, :pad], top_in[:, :, -pad:]], axis=-1)
        cn = _conv_valid(cn_in, w_corners, groups=4)     # (B, band, band, 4c_o)

        # assemble full-width top/bottom bands (B, band, W, c_o)
        row0 = jnp.concatenate(
            [cn[..., 0 * c_o:1 * c_o], tb[..., 0 * c_o:1 * c_o],
             cn[..., 1 * c_o:2 * c_o]], axis=2)
        row1 = jnp.concatenate(
            [cn[..., 2 * c_o:3 * c_o], tb[..., 1 * c_o:2 * c_o],
             cn[..., 3 * c_o:4 * c_o]], axis=2)
        left_band = lr[..., 0 * c_o:1 * c_o]             # rows band..H-band-1
        right_band = lr[..., 1 * c_o:2 * c_o]
        return row0, row1, left_band, right_band, band

    def _overwrite_bands_aligned(self, y6, bands, c_o, H, W):
        """Band scatter as 4 aligned channel-slice dynamic updates.

        With band ≤ f and block-aligned band offsets, the dense band rows
        occupy a *contiguous* channel range of one block-row (channel order
        (a, b, c)), and the band cols a contiguous sub-range per a-group —
        so each write touches a small slice with no read-merge and no
        relayout. Measured ~5× cheaper than the strip round-trip variant
        (PERF.md). Caller checks alignment and falls back otherwise.
        """
        f = self.f
        row0, row1, lb, rb, band = bands
        B, h, w, _ = y6.shape
        Hp, Wp = h * f, w * f
        C = c_o

        def padW(r):
            if Wp == W:
                return r
            return jnp.pad(r, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))

        def rows_to_chan(rows):
            # (B, band, Wp, C) → (B, 1, w, band·f·C) in (a, b, c) order
            r = padW(rows).reshape(B, band, w, f, C)
            r = r.transpose(0, 2, 1, 3, 4)
            return r.reshape(B, 1, w, band * f * C)

        y6 = y6.at[:, 0:1, :, :band * f * C].set(rows_to_chan(row0))
        hb = (H - band) // f
        lo = (H - band) - hb * f
        y6 = y6.at[:, hb:hb + 1, :, lo * f * C:(lo + band) * f * C].set(
            rows_to_chan(row1))

        # full-height column bands incl. corners from the row bands
        def col_full(cols, row_lo, row_hi):
            full = jnp.concatenate([row_lo, cols, row_hi], axis=1)
            if Hp != H:
                full = jnp.pad(full, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
            return full.reshape(B, h, f, band, C).reshape(
                B, h, 1, f, band * C)

        lcf = col_full(lb, row0[:, :, :band], row1[:, :, :band])
        rcf = col_full(rb, row0[:, :, W - band:], row1[:, :, W - band:])

        y5 = y6.reshape(B, h, w, f, f * C)
        y5 = y5.at[:, :, 0:1, :, :band * C].set(lcf)
        wb = (W - band) // f
        lo_w = (W - band) - wb * f
        y5 = y5.at[:, :, wb:wb + 1, :, lo_w * C:(lo_w + band) * C].set(rcf)
        return y5.reshape(B, h, w, f * f * C)

    @staticmethod
    def _bands_aligned(H, W, band, f):
        """Alignment conditions for the aligned scatter."""
        hb_lo = (H - band) - ((H - band) // f) * f
        wb_lo = (W - band) - ((W - band) // f) * f
        return band <= f and hb_lo + band <= f and wb_lo + band <= f

    def _overwrite_bands(self, y6, bands, c_o, H, W):
        """Write the dense boundary bands into the s2d tensor by editing
        only the edge block-rows/cols (small strips + dynamic updates —
        no full-tensor concats)."""
        f = self.f
        row0, row1, lb, rb, band = bands
        B, h, w, _ = y6.shape
        Hp, Wp = h * f, w * f
        assert band <= f

        def padW(r):
            if Wp == W:
                return r
            return jnp.pad(r, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))

        # dense rows [0, band): inside block-row 0
        strip = depth_to_space(y6[:, :1], f, c_o)
        strip = jnp.concatenate([padW(row0), strip[:, band:]], axis=1)
        y6 = y6.at[:, :1].set(space_to_depth(strip, f))

        # dense rows [H-band, H): inside the last valid block-row(s)
        hb = (H - band) // f
        strip = depth_to_space(y6[:, hb:], f, c_o)
        lo = (H - band) - hb * f
        strip = jnp.concatenate(
            [strip[:, :lo], padW(row1), strip[:, lo + band:]], axis=1)
        y6 = y6.at[:, hb:].set(space_to_depth(strip, f))

        row_mask = jnp.zeros((Hp, 1, 1), y6.dtype
                             ).at[band:H - band].set(1.0)

        def padH(cols):
            full = jnp.zeros((B, Hp, band, c_o), cols.dtype)
            return full.at[:, band:H - band].set(cols)

        # dense cols [0, band) on rows band..H-band-1: block-col 0
        strip = depth_to_space(y6[:, :, :1], f, c_o)          # (B,Hp,f,c)
        new_left = (strip[:, :, :band] * (1 - row_mask)
                    + padH(lb) * row_mask)
        strip = jnp.concatenate([new_left, strip[:, :, band:]], axis=2)
        y6 = y6.at[:, :, :1].set(space_to_depth(strip, f))

        # dense cols [W-band, W)
        wb = (W - band) // f
        strip = depth_to_space(y6[:, :, wb:], f, c_o)
        lo = (W - band) - wb * f
        new_right = (strip[:, :, lo:lo + band] * (1 - row_mask)
                     + padH(rb) * row_mask)
        strip = jnp.concatenate(
            [strip[:, :, :lo], new_right, strip[:, :, lo + band:]], axis=2)
        y6 = y6.at[:, :, wb:].set(space_to_depth(strip, f))
        return y6

    # ------------------------------------------------------------------

    def _layer(self, x6, C_in, lay: _FastLayer, mask, valid_count, H, W):
        y6 = conv_s2d(x6, lay.w_s2d)
        if lay.learned:
            bands = self._blc_bands(x6, C_in, lay.c_o, lay.k,
                                    lay.w_corners, lay.w_tb, lay.w_lr,
                                    H, W)
            y6 = self._overwrite_bands(y6, bands, lay.c_o, H, W)
            y6 = y6 + jnp.tile(lay.bias[0, 0, 0], self.f * self.f)
        else:
            y6 = y6 + jnp.tile(lay.conv_bias, self.f * self.f)
        if mask is not None:
            y6 = y6 * jnp.repeat(mask, lay.c_o, axis=-1)[None]
        y6 = group_norm_s2d(y6, self.f, lay.c_o, lay.num_groups,
                            lay.gn_scale, lay.gn_bias,
                            valid_count=valid_count, mask=mask)
        y6 = self.act(y6)
        if mask is not None:
            y6 = y6 * jnp.repeat(mask, lay.c_o, axis=-1)[None]
        return y6

    def _blc_merge(self, x6, C_in, spec, mask, H, W):
        y6 = conv_s2d(x6, spec["w_s2d"])
        bands = self._blc_bands(x6, C_in, spec["c_o"], spec["k"],
                                spec["w_corners"], spec["w_tb"],
                                spec["w_lr"], H, W)
        y6 = self._overwrite_bands(y6, bands, spec["c_o"], H, W)
        y6 = y6 + jnp.tile(spec["bias"][0, 0, 0], self.f * self.f)
        if mask is not None:
            y6 = y6 * jnp.repeat(mask, spec["c_o"], axis=-1)[None]
        return y6

    # ---- hoisted input assembly (T-only megakernel input path) ----

    input_hoisted = False

    def bind_input_assembly(self, static, params) -> bool:
        """Hoist the per-rollout-constant input channels out of the step.

        Five of the surrogate's seven input channels (xc/4, yc/4, raq,
        fkt, fkp — sim/stepper.py:assemble_fluidnet_input, reference
        pytorch_networks_convae.py:388-407) are constants of the
        (grid, params) pair, and the log-viscosity channel is an
        elementwise function of T alone — so the per-step input
        space-to-depth relayout only has to move ONE channel.  This
        precomputes the static lanes in rect block layout, the
        1-minus-depth plane and pad mask the in-layout viscosity needs,
        and the 0/1 lane-scatter matrices that place the two dynamic
        channels; :meth:`apply_from_T` then assembles the kernel input
        as ``static6r + t6r·M_T + vis6r·M_V`` (two exact HIGHEST-
        precision scatters) instead of a dense stack + 7-channel s2d.

        Returns True when the T-only path is active (megakernel build,
        c_i == 7); bitwise-identical outputs to ``__call__`` on the
        assembled input (elementwise ops are layout-invariant, the
        scatter products multiply by exact 1.0).

        Safe to call from inside a trace (the stepper binds lazily on
        the first ``stokes``): ``ensure_compile_time_eval`` keeps the
        hoisted constants concrete — without it they would be staged as
        scan-body tracers and leak into the next trace.
        """
        if not (self.use_megakernel and self.m.c_i == 7):
            return False
        from ..constants import COORD_SCALE
        from ..ops.branch_kernel import FC, FR, _round8
        from ..ops.s2d import space_to_depth_rect
        from ..sim.stepper import assemble_fluidnet_input
        H, W = self.H, self.W
        Wp = _round8(-(-W // FC)) * FC
        self._in_padw = Wp - W

        def pad_w(a):
            return jnp.pad(a, ((0, 0), (0, 0), (0, self._in_padw),
                               (0, 0)))

        with jax.ensure_compile_time_eval():
            # assembled input with both T-dependent lanes zeroed (T == 0
            # zeroes channel 6; channel 2 is overwritten explicitly)
            x0, _ = assemble_fluidnet_input(
                jnp.zeros((1, H, W), self.dtype), static, params)
            x0 = x0.at[..., 2].set(0.0)
            self._in_static6r = space_to_depth_rect(pad_w(x0), FR, FC)
            z = (1.0 - static.yc_feat * COORD_SCALE).astype(self.dtype)
            self._in_z6r = space_to_depth_rect(
                pad_w(z[None, ..., None]), FR, FC)
            self._in_mask6r = space_to_depth_rect(
                pad_w(jnp.ones((1, H, W, 1), self.dtype)), FR, FC)
            L = FR * FC
            MT = np.zeros((L, L * 7), np.float32)
            MV = np.zeros((L, L * 7), np.float32)
            for j in range(L):
                MT[j, j * 7 + 6] = 1.0
                MV[j, j * 7 + 2] = 1.0
            self._in_MT = jnp.asarray(MT, self.dtype)
            self._in_MV = jnp.asarray(MV, self.dtype)
        self._in_static = static
        self._in_params = params
        self.input_hoisted = True
        return True

    def _x6r_from_T(self, T):
        """Hoisted input assembly: (1, H, W) temperature → rect-layout
        kernel input ``static6r + t6r·M_T + vis6r·M_V`` (two exact
        HIGHEST-precision lane scatters; :meth:`bind_input_assembly`)."""
        from ..physics.viscosity import fk_viscosity
        from ..constants import visc_feature
        from ..ops.branch_kernel import FC, FR
        from ..ops.s2d import space_to_depth_rect_sliced
        Tp = jnp.pad(T[..., None],
                     ((0, 0), (0, 0), (0, self._in_padw), (0, 0)))
        t6r = space_to_depth_rect_sliced(Tp, FR, FC)
        p = self._in_params
        V6 = jnp.clip(
            fk_viscosity(jnp.asarray(p.fkt, T.dtype),
                         jnp.asarray(p.fkp, T.dtype),
                         self._in_z6r, t6r),
            1e-8, 1.0)
        vis6 = visc_feature(V6) * self._in_mask6r
        hp = lax.Precision.HIGHEST
        return (self._in_static6r
                + jnp.matmul(t6r, self._in_MT, precision=hp)
                + jnp.matmul(vis6, self._in_MV, precision=hp))

    def apply_from_T(self, T):
        """(B, H, W) temperature → (u, v, p) via the hoisted input
        assembly (:meth:`bind_input_assembly`).  Falls back to the
        dense assemble + ``__call__`` when B != 1."""
        if T.shape[0] != 1 or not self.input_hoisted:
            from ..sim.stepper import assemble_fluidnet_input
            x, _ = assemble_fluidnet_input(T, self._in_static,
                                           self._in_params)
            return self(x)
        H, W = self.H, self.W
        b0_raw, raw_outs, x6r = self._megakernel_from_x6r(
            self._x6r_from_T(T))
        return self._finish_mergek(b0_raw, raw_outs, x6r, H, W)

    def __call__(self, x):
        m = self.m
        f = self.f
        B, H, W, c_i = x.shape
        xp, _ = pad_to_multiple(x, f)
        mask0 = s2d_valid_mask(H, W, f, xp.dtype)
        count0 = float(H * W)

        if self.use_megakernel and B == 1:
            b0_raw, raw_outs, x6r = self._megakernel_branches(x, H, W)
            return self._finish_mergek(b0_raw, raw_outs, x6r, H, W)

        x6 = space_to_depth(xp, f)

        stem6 = self._layer(x6, c_i, self.stem, mask0, count0, H, W)

        # branches (pool in dense space for exact VALID semantics)
        branches_dense = []
        for l in range(m.levels):
            if l == 0:
                y6, hH, hW, msk, cnt = stem6, H, W, mask0, count0
            else:
                prev = branches_pool
                dense = prev[:, :hH, :hW, :]
                dense = avg_pool_nhwc(dense, m.factor)
                hH, hW = dense.shape[1], dense.shape[2]
                msk = s2d_valid_mask(hH, hW, f, dense.dtype)
                cnt = float(hH * hW)
                dense, _ = pad_to_multiple(dense, f)
                y6 = space_to_depth(dense, f)
            branches_pool = depth_to_space(y6, f, m.c_h)
            for r in range(m.repeats):
                y6 = self._layer(y6, m.c_h, self.branches[l][r], msk, cnt,
                                 hH, hW)
            yd = depth_to_space(y6, f, m.c_h)[:, :hH, :hW, :]
            if l > 0:
                yd = resize_bicubic_nhwc(yd, (H, W))
            branches_dense.append(yd)

        return self._finish(branches_dense, x, H, W, mask0, count0)

    def _megakernel_branches(self, x, H, W):
        """Stem + branch stacks as whole-branch Pallas kernels
        (ops/branch_kernel.py).

        The whole level chain stays in block layout: the factor-2 pool
        is 4 parity slices × lane matmuls (ops/s2d.avg_pool_rect), so
        the only dense round-trips are the coarse branches feeding
        bicubic resize. Returns (branch-0 rect output, resized dense
        branches l≥1, rect input) for the f4p merge assembly."""
        m = self.m
        from ..ops.s2d import space_to_depth_rect
        from ..ops.branch_kernel import FR, FC, _round8
        Wp = _round8(-(-W // FC)) * FC
        if Wp != W:
            # ragged width: zero-pad to the kernels' _round8 block-col
            # run width — the pad lane groups and trailing pad blocks
            # stay exact zeros through every kernel (and the padded
            # width keeps this relayout off the slow odd-width path)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
        x6r = space_to_depth_rect(x, FR, FC)
        return self._megakernel_from_x6r(x6r)

    def _megakernel_from_x6r(self, x6r):
        """Run stem + branch kernels on a prebuilt rect-layout input."""
        m = self.m
        if self.mk_stem is None:
            self._build_megakernel()
        # raw haloed chaining: each kernel's output keeps its zero halo,
        # and the factor-2 pool of the next level's input is the branch
        # kernel's in-kernel second output — no XLA pad/slice/pool ops
        # between levels
        b_in_h = self.mk_stem.call_raw(self.mk_stem.prep(x6r[0]))
        if self.mk_stem._C != self.mk_branches[0]._C:
            # stem lane padding differs (c_i > c_h): re-prep once
            hr0, wc0 = self.mk_stem._hr, self.mk_stem._wc
            b_in_h = self.mk_branches[0].prep(
                b_in_h[1:hr0 + 1, 1:wc0 + 1, :8 * m.c_h])

        b0_raw = None
        raw_outs = []
        for l in range(m.levels):
            stack = self.mk_branches[l]
            out = stack.call_raw(b_in_h)
            if stack.pool:
                y_h, b_in_h = out
            else:
                y_h = out
            if l == 0:
                b0_raw = y_h          # keep the raw halo for the merge
            else:
                raw_outs.append(y_h)
        return b0_raw, raw_outs, x6r

    def apply_psi_from_T(self, T):
        """(1, H, W) temperature → the dense (1, H, W) stream function
        (merge-3 output channel 0, BEFORE mean subtraction / a_bound),
        for the fused curl+advection epilogue
        (ops/epilogue_kernel.py). Caller gates on curl config (no
        blur, no p_pred); requires the hoisted input path."""
        H, W = self.H, self.W
        b0_raw, raw_outs, x6r = self._megakernel_from_x6r(
            self._x6r_from_T(T))
        return self._finish_mergek(b0_raw, raw_outs, x6r, H, W,
                                   return_psi=True)

    def _finish_mergek(self, b0_raw, raw_outs, x6r, H, W,
                       return_psi: bool = False):
        """Merge stage as three Pallas kernels (learned path).

        The trunk kernel (ops/merge_kernel.py) consumes the RAW haloed
        branch outputs: it upsamples the coarse levels in VMEM, keeps
        each piece in its own narrow scratch (the 87-channel lane
        concat never materializes), and runs merge-1 = conv + BLC bands
        + bias + GN0 + GELU; merges 2/3 chain on its raw haloed output
        with GroupNorm/activation statically off."""
        m = self.m
        from ..ops.branch_kernel import FR, FC
        from ..ops.s2d import depth_to_space_rect

        def lanepad(pc):
            return (jnp.pad(pc, ((0, 0), (0, 0),
                                 (0, 128 - pc.shape[-1])))
                    if pc.shape[-1] < 128 else pc)

        xh = lanepad(jnp.pad(x6r[0], ((1, 1), (1, 1), (0, 0))))
        pieces = ([lanepad(b0_raw)] + [lanepad(o) for o in raw_outs]
                  + [xh])
        y1 = self.mkm1(*pieces)
        y2 = self.mkm2.call_raw(y1)
        y3 = self.mkm3.call_raw(y2)
        hr, wc = self.mkm3._hr, self.mkm3._wc
        c_o = (self.merge3["c_o"] if isinstance(self.merge3, dict)
               else self.merge3[2])
        psi6 = y3[1:hr + 1, 1:wc + 1, :FR * FC * c_o][None]
        y = depth_to_space_rect(psi6, FR, FC, c_o)[:, :H, :W, :]
        if return_psi:
            # raw stream function for the fused epilogue (the spatial
            # mean cancels analytically in the curl derivatives)
            return y[..., 0]
        y = y - jnp.mean(y, axis=(1, 2), keepdims=True)
        if m.loss_type in ("mae", "mass"):
            u = y[..., 0]
            v = y[..., 1]
            p = y[..., 2] if m.p_pred else None
            return u, v, p
        a = y[..., 0] * m.a_bound
        if m.blurr:
            a = blur3x3(a)
        p = y[..., 1] if m.p_pred else None
        u, v = curl_head_padded(a)
        return u, v, p

    def _finish(self, branches_dense, x, H, W, mask0, count0):
        m = self.m
        f = self.f
        y = jnp.concatenate(branches_dense + [x], axis=-1)
        c_cat = y.shape[-1]
        yp, _ = pad_to_multiple(y, f)
        y6 = space_to_depth(yp, f)

        if isinstance(self.merge1, dict):
            y6 = self._blc_merge(y6, c_cat, self.merge1, mask0, H, W)
        else:
            w1, b1, c1 = self.merge1
            y6 = conv_s2d(y6, w1) + jnp.tile(b1, f * f)
            if mask0 is not None:
                y6 = y6 * jnp.repeat(mask0, c1, axis=-1)[None]
        y6, c_o = self._merge_tail(y6, mask0, count0, H, W)
        return self._head(y6, c_o, H, W)

    def _merge_tail(self, y6, mask0, count0, H, W):
        """GN0 + activation + merge convs 2/3, after merge-1 has been
        applied (with its boundary bands in the learned case)."""
        m = self.m
        f = self.f
        y6 = group_norm_s2d(y6, f, m.c_h,
                            max(1, m.c_h // 4), self.gn0_scale,
                            self.gn0_bias, valid_count=count0,
                            mask=mask0)
        y6 = self.act(y6)
        if isinstance(self.merge2, dict):
            if mask0 is not None:
                y6 = y6 * jnp.repeat(mask0, m.c_h, axis=-1)[None]
            y6 = self._blc_merge(y6, m.c_h, self.merge2, mask0, H, W)
            y6 = self.act(y6)
            if mask0 is not None:
                y6 = y6 * jnp.repeat(mask0, m.c_h, axis=-1)[None]
            y6 = self._blc_merge(y6, m.c_h, self.merge3, mask0, H, W)
            c_o = self.merge3["c_o"]
        else:
            w2, b2, c2 = self.merge2
            y6 = conv_s2d(y6, w2) + jnp.tile(b2, f * f)
            if mask0 is not None:
                y6 = y6 * jnp.repeat(mask0, c2, axis=-1)[None]
            y6 = self.act(y6)
            w3, b3, c_o = self.merge3
            y6 = conv_s2d(y6, w3) + jnp.tile(b3, f * f)
        return y6, c_o

    def _head(self, y6, c_o, H, W):
        m = self.m
        f = self.f
        y = depth_to_space(y6, f, c_o)[:, :H, :W, :]
        y = y - jnp.mean(y, axis=(1, 2), keepdims=True)

        if m.loss_type in ("mae", "mass"):
            u = y[..., 0]
            v = y[..., 1]
            p = y[..., 2] if m.p_pred else None
            return u, v, p

        a = y[..., 0] * m.a_bound
        if m.blurr:
            a = blur3x3(a)
        p = y[..., 1] if m.p_pred else None
        u, v = curl_head_padded(a)
        return u, v, p
