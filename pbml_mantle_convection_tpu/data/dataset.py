"""Datasets: snapshot stores with on-device batch assembly.

TPU-native redesign of the reference's data layer (datasetio.py). The
reference assembles 7-11 channel inputs per sample on the CPU inside
``__getitem__`` (datasetio.py:595-654) — a known bottleneck. Here snapshots
live as compact arrays (T, u, v[, p], params) and the channel assembly is a
vmapped, jitted gather on device, so the input pipeline never leaves HBM.

Two residency modes (auto-selected by store size vs
``PMC_DEVICE_STORE_BYTES``, default 4 GiB):

* **device-resident** (small stores): the whole store lives in HBM; a
  batch is one jitted gather+assemble, zero host traffic per step.
* **host-resident** (reference scale): the real training split — 96 sims
  × ~700 snapshots of 128×506 ≈ 50-70 GB — is 3-4× a v5e's 16 GB HBM, so
  the store stays NumPy (plain or ``np.memmap``); per batch, the indexed
  rows are gathered on host (~10-20 MB), ``jax.device_put`` ships them,
  and the SAME jitted assembly runs on device. ``epoch_batches`` overlaps
  gather+H2D with the train step via a depth-2 thread prefetcher
  (``data/prefetch.py``), so the device never waits on the host in steady
  state.

Two dataset flavours, mirroring the reference:
* :class:`SnapshotDataset` — single-snapshot → (7ch x, uv[p] y, t_weight,
  scaler); reference ``NewADDataset`` (datasetio.py:320-654).
* :class:`TimePairDataset` — (t, t+roll_forward) pairs for U-Net time
  stepping, incl. the every-8th-index random init-pair remap quirk
  (datasetio.py:229-236); reference ``ADTimeDataset`` (datasetio.py:63-280).

Loading the reference's on-disk ``.pt`` layout is in data/torch_io.py;
synthetic stores for tests/benchmarks are in data/synthetic.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import (
    COORD_SCALE, T_WEIGHT_NUM, T_WEIGHT_POW, nondim_fkp, nondim_fkt,
    nondim_raq, velocity_scaler, visc_feature)
from ..physics.viscosity import fk_viscosity
from .prefetch import prefetch_iter

# Stores whose big fields exceed this stay host-resident (NumPy/memmap)
# and are fed per batch; below it the whole store moves to HBM once.
# 4 GiB default leaves a 16 GiB v5e chip room for model, optimizer,
# activations and the assembled batches. PMC_DEVICE_STORE_BYTES overrides.
_DEVICE_STORE_BYTES_DEFAULT = 4 << 30


def _device_store_limit() -> int:
    env = os.environ.get("PMC_DEVICE_STORE_BYTES")
    return int(env) if env else _DEVICE_STORE_BYTES_DEFAULT


@dataclasses.dataclass
class SnapshotStore:
    """Compact per-snapshot arrays for one or more simulations.

    All arrays are stacked over the snapshot axis N:
      T, u, v: (N, H, W); p: (N, H, W) or None;
      paras: (N, 3) = (raq, fkt, fkp); step_index: (N,) the snapshot's
      time-step index i (used for the 6/(i+1)^0.25 weight,
      datasetio.py:472); sim_id: (N,) integer simulation id;
      times: (N,) physical time of each snapshot.
    xc, yc: (H, W) coordinates (boundary-clamped).
    """

    T: np.ndarray
    u: np.ndarray
    v: np.ndarray
    p: Optional[np.ndarray]
    paras: np.ndarray
    step_index: np.ndarray
    sim_id: np.ndarray
    times: np.ndarray
    xc: np.ndarray
    yc: np.ndarray

    def __len__(self):
        return self.T.shape[0]

    def field_nbytes(self, itemsize: int = 4) -> int:
        """Bytes the big per-snapshot fields (T, u, v[, p]) occupy at the
        given item size — the quantity that decides device vs host
        residency (the small vectors are negligible)."""
        n_fields = 3 + (1 if self.p is not None else 0)
        return int(np.prod(self.T.shape)) * itemsize * n_fields

    @property
    def paras_nd(self) -> np.ndarray:
        raq, fkt, fkp = self.paras[:, 0], self.paras[:, 1], self.paras[:, 2]
        return np.stack([nondim_raq(raq), nondim_fkt(fkt, np),
                         nondim_fkp(fkp, np)], axis=1)

    @property
    def scaler(self) -> np.ndarray:
        return velocity_scaler(self.paras[:, 0], self.paras[:, 1],
                               self.paras[:, 2])


def select_snapshot_indices(n_times: int, rng: np.random.Generator,
                            is_init: bool = False) -> np.ndarray:
    """The reference's snapshot-selection rule (datasetio.py:441-457 and
    preprocess.ipynb): use steps 1..199 plus ≤500 random samples from the
    tail when a run is long (>700 steps); ``is_init`` takes the first 5,
    otherwise the rest."""
    times = n_times - 2
    if times > 200:
        rest = list(range(200, times))
    else:
        rest = []
    if times > 700:
        rest = list(rng.choice(rest, size=min(500, rest[-1] - 200),
                               replace=True))
        i_vec = list(range(1, 200)) + rest
    else:
        i_vec = list(range(1, times))
    return np.asarray(i_vec[:5] if is_init else i_vec[5:], dtype=np.int64)


class SnapshotDataset:
    """Single-snapshot dataset with device-side assembly
    (reference ``NewADDataset``, datasetio.py:320-654)."""

    def __init__(self, store: SnapshotStore, scale: bool = True,
                 p_pred: bool = False, noise: float = 0.0,
                 max_examples_percent_per_epoch: float = 100.0,
                 dtype=jnp.float32, host_resident: Optional[bool] = None,
                 prefetch: int = 2):
        self.store = store
        self.scale = scale
        self.p_pred = p_pred and store.p is not None
        self.noise = noise
        self.dtype = dtype
        self.prefetch = prefetch
        n = len(store)
        self.num_examples = min(
            int(n * max_examples_percent_per_epoch / 100.0), n)

        d = dtype
        itemsize = jnp.dtype(d).itemsize
        if host_resident is None:
            host_resident = store.field_nbytes(itemsize) > \
                _device_store_limit()
        self.host_resident = bool(host_resident)

        self._gather_keys = ("T", "u", "v", "paras", "paras_nd",
                             "scaler", "steps") + (
                                 ("p",) if self.p_pred else ())

        if self.host_resident:
            # HBM-scale mode: the store stays NumPy (plain or memmap —
            # the real 96-sim split is ~50-70 GB vs 16 GB v5e HBM,
            # datasetio.py:33,96); per batch the indexed rows are
            # gathered on host and device_put, then the jitted assembly
            # below runs on device. epoch_batches overlaps this with
            # compute via prefetch_iter.
            np_d = np.dtype(jnp.dtype(d).name)
            self._np = {
                "T": store.T, "u": store.u, "v": store.v,
                "paras": np.asarray(store.paras, np_d),
                "paras_nd": np.asarray(store.paras_nd, np_d),
                "scaler": np.asarray(store.scaler, np_d),
                "steps": np.asarray(store.step_index, np_d),
            }
            if self.p_pred:
                self._np["p"] = store.p
            self._np_dtype = np_d
            self._xy = {"xc": jnp.asarray(store.xc, d),
                        "yc": jnp.asarray(store.yc, d)}
            self._assemble_g_jit = jax.jit(self._assemble_gathered)
            self._assemble = self._assemble_host
            return

        self._T = jnp.asarray(store.T, d)
        self._u = jnp.asarray(store.u, d)
        self._v = jnp.asarray(store.v, d)
        self._p = jnp.asarray(store.p, d) if self.p_pred else None
        self._paras = jnp.asarray(store.paras, d)
        self._paras_nd = jnp.asarray(store.paras_nd, d)
        self._scaler = jnp.asarray(store.scaler, d)
        self._steps = jnp.asarray(store.step_index, d)
        self._xc = jnp.asarray(store.xc, d)
        self._yc = jnp.asarray(store.yc, d)

        # the store arrays are passed to the jitted assembly as
        # ARGUMENTS (a pytree), not read off ``self`` inside the traced
        # function: closed-over device arrays embed as program
        # constants, and at reference scale (hundreds of 128×506
        # snapshots) the serialized program then exceeds what the
        # remote-compile tunnel accepts (HTTP 413) — and bloats AOT
        # caches everywhere else.
        self._fields = {
            "T": self._T, "u": self._u, "v": self._v,
            "paras": self._paras, "paras_nd": self._paras_nd,
            "scaler": self._scaler, "steps": self._steps,
            "xc": self._xc, "yc": self._yc,
        }
        if self.p_pred:
            self._fields["p"] = self._p
        self._assemble_jit = jax.jit(self._assemble_batch)
        self._assemble = lambda idx, key: self._assemble_jit(
            self._fields, idx, key)

    def __len__(self):
        return self.num_examples

    def _assemble_host(self, idx, noise_key):
        """Host-resident path: NumPy gather (disk/RAM) → device_put →
        jitted device-side assembly. ~B·H·W·4·(3-4 fields) ≈ 10-20 MB
        per production batch, hidden behind compute by prefetch_iter."""
        idx = np.asarray(idx)
        g = {k: np.ascontiguousarray(a[idx], dtype=self._np_dtype)
             for k, a in self._np.items()}
        g = jax.device_put(g)
        g.update(self._xy)
        return self._assemble_g_jit(g, noise_key)

    def _assemble_batch(self, F, idx, noise_key):
        """Gather + assemble (x, y, t_weight, scaler) for integer indices
        idx: (B,). Runs on device (datasetio.py:595-654 semantics);
        ``F`` is the store-array pytree (see __init__)."""
        g = {k: F[k][idx] for k in self._gather_keys}
        g["xc"], g["yc"] = F["xc"], F["yc"]
        return self._assemble_gathered(g, noise_key)

    def _assemble_gathered(self, g, noise_key):
        """Channel assembly on already-gathered (B, …) rows — shared by
        both residency modes, so host- and device-resident batches are
        bitwise identical for the same indices."""
        T = g["T"]
        u = g["u"]
        v = g["v"]
        paras = g["paras"]
        paras_nd = g["paras_nd"]
        scaler = g["scaler"]
        steps = g["steps"]

        if self.noise > 0:
            # uniform(-1e-5, 1e-5) on the [2:-2, 2:-2] interior, clipped to
            # [0, 1.35] (datasetio.py:604-613)
            n = jax.random.uniform(
                noise_key, T[:, 2:-2, 2:-2].shape, T.dtype, -1e-5, 1e-5)
            T = T.at[:, 2:-2, 2:-2].set(
                jnp.clip(T[:, 2:-2, 2:-2] + n, 0.0, 1.35))

        V = fk_viscosity(paras[:, 1][:, None, None],
                         paras[:, 2][:, None, None],
                         1.0 - g["yc"][None], T)
        V = jnp.clip(V, 1e-8, 1.0)

        xc = jnp.broadcast_to(g["xc"] / COORD_SCALE, T.shape)
        yc = jnp.broadcast_to(g["yc"] / COORD_SCALE, T.shape)

        def plane(c):
            return jnp.broadcast_to(c[:, None, None], T.shape)

        x = jnp.stack([xc, yc, visc_feature(V), plane(paras_nd[:, 0]),
                       plane(paras_nd[:, 1]), plane(paras_nd[:, 2]), T],
                      axis=-1)

        s = scaler[:, None, None] if self.scale else jnp.ones_like(
            scaler)[:, None, None]
        ys = [u / s, v / s]
        if self.p_pred:
            ys.append(g["p"])
        y = jnp.stack(ys, axis=1)

        t_weight = T_WEIGHT_NUM / (steps + 1.0) ** T_WEIGHT_POW
        return {"x": x, "y": y, "t_weight": t_weight, "scaler": scaler}

    def batch(self, rng: np.random.Generator, batch_size: int,
              noise_key=None):
        """Sample a random batch (host RNG for indices, device assembly)."""
        idx = rng.integers(0, self.num_examples, size=batch_size)
        if noise_key is None:
            noise_key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
        return self._assemble(idx, noise_key)

    def epoch_batches(self, rng: np.random.Generator, batch_size: int,
                      drop_last: bool = True):
        """Shuffled epoch iterator (reference DataLoader shuffle=True,
        multigpu.py:772-779). All RNG draws happen up front so the
        host-resident prefetch worker shares no mutable state with the
        consumer."""
        perm = rng.permutation(self.num_examples)
        n_full = len(perm) // batch_size
        bounds = [(i * batch_size, (i + 1) * batch_size)
                  for i in range(n_full)]
        if not drop_last and len(perm) % batch_size:
            bounds.append((n_full * batch_size, len(perm)))
        keys = [jax.random.PRNGKey(int(rng.integers(0, 2**31)))
                for _ in bounds]

        def make(i):
            lo, hi = bounds[i]
            return self._assemble(perm[lo:hi], keys[i])

        depth = self.prefetch if self.host_resident else 0
        yield from prefetch_iter(make, len(bounds), depth)


class UnstructuredDataset:
    """Point-cloud view of a snapshot store for Transolver/ViT training.

    NOTE: the reference's ``UnstructuredDataset`` is *lost* (referenced at
    multigpu.py:690 but defined nowhere — SURVEY.md §2 dangling refs);
    this is a documented reconstruction. Emits
    ``x: (B, N, 2 + 5)`` = (xc/4, yc/4 | log10V/8, raq_nd, fkt_nd,
    fkp_nd, T) flattened over the grid (the Transolver input contract,
    Transolver_Structured_Mesh_2D-checkpoint.py:171-181) and
    ``y: (B, C, H, W)`` like :class:`SnapshotDataset`.
    """

    def __init__(self, store: SnapshotStore, scale: bool = True,
                 p_pred: bool = False, dtype=jnp.float32, **kw):
        self._inner = SnapshotDataset(store, scale=scale, p_pred=p_pred,
                                      dtype=dtype, **kw)

    def __len__(self):
        return len(self._inner)

    @staticmethod
    def _flatten(batch):
        x = batch["x"]
        B, H, W, C = x.shape
        batch = dict(batch)
        batch["x"] = x.reshape(B, H * W, C)
        return batch

    def batch(self, rng, batch_size, **kw):
        return self._flatten(self._inner.batch(rng, batch_size, **kw))

    def epoch_batches(self, rng, batch_size, **kw):
        for b in self._inner.epoch_batches(rng, batch_size, **kw):
            yield self._flatten(b)


class ConvAEDataset:
    """(u, v, T) → itself autoencoding dataset for the ConvAE surrogate.

    NOTE: the reference's ``ConvAEDataset`` is *lost* (multigpu.py:688);
    documented reconstruction: inputs are the scaled velocity pair plus
    temperature (c_i = 3, multigpu.py:1075-1077), target is the input.
    """

    def __init__(self, store: SnapshotStore, scale: bool = True,
                 dtype=jnp.float32, **kw):
        kw.pop("p_pred", None)
        self._inner = SnapshotDataset(store, scale=scale, p_pred=False,
                                      dtype=dtype, **kw)

    def __len__(self):
        return len(self._inner)

    @staticmethod
    def _to_ae(batch):
        y = batch["y"]                      # (B, 2, H, W) scaled u, v
        T = batch["x"][..., 6]              # temperature channel
        x = jnp.stack([y[:, 0], y[:, 1], T], axis=-1)
        return {"x": x, "y": jnp.concatenate(
            [y, T[:, None]], axis=1), "scaler": batch["scaler"]}

    def batch(self, rng, batch_size, **kw):
        return self._to_ae(self._inner.batch(rng, batch_size, **kw))

    def epoch_batches(self, rng, batch_size, **kw):
        for b in self._inner.epoch_batches(rng, batch_size, **kw):
            yield self._to_ae(b)


class TimePairDataset:
    """(t, t + roll_forward) pair dataset for the U-Net
    (reference ``ADTimeDataset``, datasetio.py:63-280)."""

    def __init__(self, store: SnapshotStore, roll_forward: int = 1,
                 p_pred: bool = False, dtype=jnp.float32,
                 host_resident: Optional[bool] = None, prefetch: int = 2):
        self.store = store
        self.roll_forward = roll_forward
        self.p_pred = p_pred and store.p is not None
        self.dtype = dtype
        self.prefetch = prefetch

        # Build (idx0, idx1) pairs within each simulation
        # (datasetio.py:189-201): consecutive-in-store snapshots of the
        # same sim, roll_forward apart, skipping the last pairs.
        pairs = []
        init_pairs = []
        sim = store.sim_id
        for s in np.unique(sim):
            where = np.nonzero(sim == s)[0]
            for j in range(len(where) - roll_forward - 1):
                pairs.append((where[j], where[j + roll_forward]))
                if j == 0:
                    init_pairs.append((where[0], where[roll_forward]))
        self.pairs = np.asarray(pairs, dtype=np.int64)
        self.init_pairs = np.asarray(init_pairs, dtype=np.int64)

        d = dtype
        itemsize = jnp.dtype(d).itemsize
        if host_resident is None:
            host_resident = store.field_nbytes(itemsize) > \
                _device_store_limit()
        self.host_resident = bool(host_resident)

        if self.host_resident:
            # HBM-scale mode — see SnapshotDataset.__init__
            np_d = np.dtype(jnp.dtype(d).name)
            self._np = {
                "T": store.T, "u": store.u, "v": store.v,
                "paras": np.asarray(store.paras, np_d),
                "paras_nd": np.asarray(store.paras_nd, np_d),
                "scaler": np.asarray(store.scaler, np_d),
                "times": np.asarray(store.times, np_d),
            }
            if self.p_pred:
                self._np["p"] = store.p
            self._np_dtype = np_d
            self._xy = {"xc": jnp.asarray(store.xc, d),
                        "yc": jnp.asarray(store.yc, d)}
            self._assemble_g_jit = jax.jit(self._assemble_gathered)
            self._assemble = self._assemble_host
            return

        self._T = jnp.asarray(store.T, d)
        self._u = jnp.asarray(store.u, d)
        self._v = jnp.asarray(store.v, d)
        self._p = jnp.asarray(store.p, d) if self.p_pred else None
        self._paras = jnp.asarray(store.paras, d)
        self._paras_nd = jnp.asarray(store.paras_nd, d)
        self._scaler = jnp.asarray(store.scaler, d)
        self._times = jnp.asarray(store.times, d)
        self._xc = jnp.asarray(store.xc, d)
        self._yc = jnp.asarray(store.yc, d)

        # store arrays travel as jit ARGUMENTS (see SnapshotDataset:
        # closed-over device arrays embed as program constants and
        # overflow the remote-compile tunnel at reference scale)
        self._fields = {
            "T": self._T, "u": self._u, "v": self._v,
            "paras": self._paras, "paras_nd": self._paras_nd,
            "scaler": self._scaler, "times": self._times,
            "xc": self._xc, "yc": self._yc,
        }
        if self.p_pred:
            self._fields["p"] = self._p
        self._assemble_jit = jax.jit(self._assemble_batch)
        self._assemble = lambda i0, i1: self._assemble_jit(
            self._fields, i0, i1)

    def __len__(self):
        return len(self.pairs)

    def _remap_init(self, pair_idx: np.ndarray,
                    rng: np.random.Generator) -> np.ndarray:
        """Every pair whose idx0 % 8 == 0 is replaced by a random init pair
        (the reference's quirk, datasetio.py:233-236)."""
        pairs = self.pairs[pair_idx].copy()
        mask = pairs[:, 0] % 8 == 0
        if mask.any() and len(self.init_pairs):
            repl = self.init_pairs[
                rng.integers(0, len(self.init_pairs), size=int(mask.sum()))]
            pairs[mask] = repl
        return pairs

    def _assemble_host(self, idx0, idx1):
        """Host-resident path — see SnapshotDataset._assemble_host."""
        idx0, idx1 = np.asarray(idx0), np.asarray(idx1)
        d = self._np_dtype
        g = {"T0": self._np["T"][idx0], "u0": self._np["u"][idx0],
             "v0": self._np["v"][idx0],
             "paras": self._np["paras"][idx0],
             "paras_nd": self._np["paras_nd"][idx0],
             "scaler": self._np["scaler"][idx0],
             "t0": self._np["times"][idx0],
             "t1": self._np["times"][idx1],
             "T1": self._np["T"][idx1], "u1": self._np["u"][idx1],
             "v1": self._np["v"][idx1]}
        if self.p_pred:
            g["p0"] = self._np["p"][idx0]
            g["p1"] = self._np["p"][idx1]
        g = jax.device_put({k: np.ascontiguousarray(a, dtype=d)
                            for k, a in g.items()})
        g.update(self._xy)
        return self._assemble_g_jit(g)

    def _assemble_batch(self, F, idx0, idx1):
        g = {"T0": F["T"][idx0], "u0": F["u"][idx0], "v0": F["v"][idx0],
             "paras": F["paras"][idx0], "paras_nd": F["paras_nd"][idx0],
             "scaler": F["scaler"][idx0],
             "t0": F["times"][idx0], "t1": F["times"][idx1],
             "T1": F["T"][idx1], "u1": F["u"][idx1], "v1": F["v"][idx1]}
        if self.p_pred:
            g["p0"] = F["p"][idx0]
            g["p1"] = F["p"][idx1]
        g["xc"], g["yc"] = F["xc"], F["yc"]
        return self._assemble_gathered(g)

    def _assemble_gathered(self, g):
        """Channel assembly on gathered (B, …) rows — shared by both
        residency modes (bitwise-identical batches for equal indices)."""
        T0, u0, v0 = g["T0"], g["u0"], g["v0"]
        paras = g["paras"]
        paras_nd = g["paras_nd"]
        scaler = g["scaler"][:, None, None]
        dt = (g["t1"] - g["t0"])[:, None, None]

        V = fk_viscosity(paras[:, 1][:, None, None],
                         paras[:, 2][:, None, None],
                         1.0 - g["yc"][None], T0)
        Vf = visc_feature(V)

        xc = jnp.broadcast_to(g["xc"] / COORD_SCALE, T0.shape)
        yc = jnp.broadcast_to(g["yc"] / COORD_SCALE, T0.shape)

        def plane(c):
            return jnp.broadcast_to(c[:, None, None], T0.shape)

        chans = [xc, yc, jnp.broadcast_to(dt, T0.shape),
                 plane(paras_nd[:, 0]), plane(paras_nd[:, 1]),
                 plane(paras_nd[:, 2]), Vf, T0, u0 / scaler, v0 / scaler]
        if self.p_pred:
            # 11th channel: previous pressure, passthrough-scaled
            # (scaler.py:27-28). NOTE: the reference's ADTimeDataset
            # declares c_i=11 for p_pred but never assembles the channel
            # (datasetio.py:258-274 builds 10) — its p_pred U-Net cannot
            # run; we complete the contract instead.
            chans.append(g["p0"])
        x = jnp.stack(chans, axis=-1)

        ys = [g["u1"] / scaler, g["v1"] / scaler]
        if self.p_pred:
            ys.append(g["p1"])
        ys.append(g["T1"])
        y = jnp.stack(ys, axis=1)

        return {"x": x, "y": y, "scaler": scaler[:, 0, 0],
                "paras": paras,
                "yc": jnp.broadcast_to(g["yc"][None], T0.shape)}

    def batch(self, rng: np.random.Generator, batch_size: int):
        pair_idx = rng.integers(0, len(self.pairs), size=batch_size)
        pairs = self._remap_init(pair_idx, rng)
        return self._assemble(pairs[:, 0], pairs[:, 1])

    def epoch_batches(self, rng: np.random.Generator, batch_size: int):
        """Shuffled epoch iterator; pair remaps and RNG draws happen up
        front so the host-resident prefetch worker shares no mutable
        state with the consumer."""
        perm = rng.permutation(len(self.pairs))
        n_full = len(perm) // batch_size
        all_pairs = [self._remap_init(
            perm[i * batch_size:(i + 1) * batch_size], rng)
            for i in range(n_full)]

        def make(i):
            return self._assemble(all_pairs[i][:, 0], all_pairs[i][:, 1])

        depth = self.prefetch if self.host_resident else 0
        yield from prefetch_iter(make, n_full, depth)
