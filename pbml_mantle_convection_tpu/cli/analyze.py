"""pmc-analyze: rollout-run comparison report.

The framework analogue of the reference's analysis notebook
(load_advection_results-checkpoint.ipynb cells 3-6): ingest N run
directories written by sim/rollout.py (the reference pickle layout —
``snapshots_<mode>.pkl`` / ``t_vec`` / ``T_vec`` / ``TS_vec``,
advect_wi_gaia.py:654-668), designate one as the solver baseline, and
emit the per-run comparison the notebook plots:

* final-snapshot temperature Pearson correlation vs the baseline
  (cell 5: ``pearsonr(z.flatten(), z_t.flatten())``),
* horizontally-averaged temperature profile MAE
  (``np.mean(np.abs(Tp_t - Tp))``),
* mean-temperature trace MAE over the common length,
* cumulative computation time and the matched-physical-time speedup
  (cell 5's ``ts_mark`` logic), plus per-step latency percentiles from
  TS_vec.

Output: a markdown table on stdout (STUDY.md-style) and, with
``--json``, the full metric dict per run.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


def load_run(run_dir: str, mode: str | None = None):
    """Load one rollout run directory. ``mode`` defaults to whatever
    single ``snapshots_*.pkl`` is present (error if ambiguous)."""
    if mode is None:
        cands = [f[len("snapshots_"):-len(".pkl")]
                 for f in os.listdir(run_dir)
                 if f.startswith("snapshots_") and f.endswith(".pkl")]
        if len(cands) != 1:
            raise ValueError(
                f"{run_dir}: expected exactly one snapshots_<mode>.pkl, "
                f"found {cands}; pass --mode")
        mode = cands[0]

    def _ld(name):
        with open(os.path.join(run_dir, f"{name}_{mode}.pkl"), "rb") as f:
            return pickle.load(f)

    return dict(mode=mode, name=os.path.basename(os.path.normpath(run_dir)),
                snapshots=_ld("snapshots"), t=np.asarray(_ld("t_vec")),
                T=np.asarray(_ld("T_vec")), TS=np.asarray(_ld("TS_vec")))


def _field(snapshots, index: int, var: str = "T"):
    """Snapshot field reshaped to (H, W), inferred from the stored
    cell-centre grids (the notebook hard-codes 128×506;
    load_advection_results cell 4 ``get_plot_data``)."""
    xcc = np.asarray(snapshots["xcc"])
    H, W = xcc.reshape(xcc.shape[-2:]).shape if xcc.ndim > 2 else xcc.shape
    if var in ("u", "v"):
        z = np.asarray(snapshots["v"][index])[:, 0 if var == "u" else 1]
    else:
        z = np.asarray(snapshots[var][index])
    return z.reshape(H, W)


def profile(z):
    """Horizontally-averaged profile + its vertical derivative on the
    reference's stretched height coordinate (get_plot_data)."""
    H = z.shape[0]
    n_in = H - 2
    r = np.asarray([0.0] + np.linspace(1 / (2 * n_in), 1 - 1 / (2 * n_in),
                                       n_in).tolist() + [1.0])
    Tp = np.mean(z, axis=-1).ravel()
    dTp = (Tp[1:] - Tp[:-1]) / (r[1:] - r[:-1])
    return r, Tp, dTp


def _speedup(t, TS, t_t, TS_t):
    """Matched-physical-time speedup (cell 5's ts_mark logic): compare
    cumulative compute time at the largest common physical time."""
    ct = np.cumsum(TS) / 3600.0
    ct_t = np.cumsum(TS_t) / 3600.0
    n = min(len(t), len(ct))
    n_t = min(len(t_t), len(ct_t))
    t, ct = t[:n], ct[:n]
    t_t, ct_t = t_t[:n_t], ct_t[:n_t]
    if len(t) == 0 or len(t_t) == 0:
        return float("nan")
    if t[-1] == t_t[-1]:
        return float(ct_t[-1] / ct[-1])
    if t[-1] > t_t[-1]:
        idx = np.where(t < t_t[-1])[0]
        if len(idx) == 0:
            return float("nan")
        return float(ct_t[-1] / ct[idx[-1]])
    idx = np.where(t_t < t[-1])[0]
    if len(idx) == 0:
        return float("nan")
    return float(ct_t[idx[-1]] / ct[-1])


def compare(run, truth, snap_index: int = -1):
    """All notebook cell-5 metrics of ``run`` against ``truth``."""
    try:
        from scipy.stats import pearsonr
        _pearson = lambda a, b: float(pearsonr(a, b)[0])
    except ImportError:                      # scipy not guaranteed
        def _pearson(a, b):
            a = a - a.mean()
            b = b - b.mean()
            return float((a * b).sum()
                         / np.sqrt((a * a).sum() * (b * b).sum()))

    z = _field(run["snapshots"], snap_index)
    z_t = _field(truth["snapshots"], snap_index)
    _, Tp, dTp = profile(z)
    _, Tp_t, dTp_t = profile(z_t)
    n = min(len(run["T"]), len(truth["T"]))
    out = dict(
        name=run["name"], mode=run["mode"],
        steps=int(len(run["t"])),
        t_end=float(run["t"][-1]) if len(run["t"]) else float("nan"),
        pearson_T=_pearson(z.ravel(), z_t.ravel()),
        profile_mae=float(np.mean(np.abs(Tp_t - Tp))),
        dprofile_mae=float(np.mean(np.abs(dTp_t - dTp))),
        trace_mae=float(np.mean(np.abs(run["T"][:n] - truth["T"][:n]))),
        T_rmse=float(np.sqrt(np.mean((z - z_t) ** 2))),
        speedup=_speedup(run["t"], run["TS"], truth["t"], truth["TS"]),
    )
    if len(run["TS"]):
        ts = np.asarray(run["TS"], float)
        out.update(
            step_ms_mean=float(ts.mean() * 1e3),
            step_ms_p50=float(np.percentile(ts, 50) * 1e3),
            step_ms_p90=float(np.percentile(ts, 90) * 1e3),
            compute_hours=float(ts.sum() / 3600.0))
    return out


_COLS = [("name", "run"), ("mode", "mode"), ("steps", "steps"),
         ("t_end", "t_end"), ("pearson_T", "Pearson(T)"),
         ("T_rmse", "T-RMSE"), ("profile_mae", "profile MAE"),
         ("trace_mae", "trace MAE"), ("speedup", "speedup"),
         ("step_ms_mean", "ms/step"), ("step_ms_p90", "p90 ms")]


def _fmt(v):
    if isinstance(v, float):
        if v != v:
            return "-"
        return f"{v:.4g}"
    return str(v)


def report(rows):
    head = [h for _, h in _COLS]
    lines = ["| " + " | ".join(head) + " |",
             "|" + "|".join("---" for _ in head) + "|"]
    for r in rows:
        lines.append("| " + " | ".join(
            _fmt(r.get(k, float("nan"))) for k, _ in _COLS) + " |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="pmc-analyze",
        description="Compare rollout run directories against a solver "
                    "baseline (load_advection_results cells 3-6).")
    ap.add_argument("runs", nargs="+",
                    help="run directories (sim/rollout.py pickle sets)")
    ap.add_argument("--truth", default=None,
                    help="baseline run directory (default: the first "
                         "run with mode GAIA, else the first run)")
    ap.add_argument("--mode", default=None,
                    help="pickle mode suffix when a dir holds several")
    ap.add_argument("--snap-index", type=int, default=-1,
                    help="snapshot index for field metrics (the "
                         "notebook uses -10 of its 200-step snaps)")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="also write the metric dicts to this file")
    args = ap.parse_args(argv)

    runs = [load_run(d, args.mode) for d in args.runs]
    if args.truth is not None:
        truth = load_run(args.truth, args.mode)
    else:
        truth = next((r for r in runs if r["mode"] == "GAIA"), runs[0])

    rows = [compare(r, truth, args.snap_index) for r in runs]
    for row, r in zip(rows, runs):
        if r is truth:
            row["name"] += " (baseline)"
    print(f"baseline: {truth['name']} [{truth['mode']}]")
    print(report(rows))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
