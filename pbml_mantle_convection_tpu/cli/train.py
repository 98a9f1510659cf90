"""Training CLI — the framework's ``multigpu.py`` equivalent.

Flags mirror the reference trainer CLI (multigpu.py:917-972); data comes
either from the reference's ``.pt`` layout (``--data_dir``) or the
hermetic synthetic generator (``--synthetic``). Data parallelism: pass
``--n_devices N`` to shard batches over a 1-D mesh (the reference's DDP,
multigpu.py:16-34).

Example (reference command shape, network_lists.ipynb cell 0):
  python -m pbml_mantle_convection_tpu.cli.train -net newfluidnet -l 5 \
      -f 16 -r 6 -k 5 -p learned -lt curl -b 16 -l_sc 1 -l_de 1 --synthetic
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train convnet")
    p.add_argument("-a", "--act_fn", type=str, default="gelu")
    p.add_argument("-l", "--levels", type=int, default=6)
    p.add_argument("-f", "--c_h", type=int, default=16)
    p.add_argument("-fac", "--factor", type=int, default=2)
    p.add_argument("-p", "--r_p", type=str, default="replicate")
    p.add_argument("-lt", "--loss_type", type=str, default="curl")
    p.add_argument("-d", "--dilation", type=int, default=1)
    p.add_argument("-b", "--batch_size", type=int, default=16)
    p.add_argument("-s", "--use_symm", type=int, default=0)
    p.add_argument("-ab", "--a_bound", type=int, default=10)
    p.add_argument("-r", "--repeats", type=int, default=4)
    p.add_argument("-rst", "--restart", type=int, default=0)
    p.add_argument("-k", "--kernel", type=int, default=5)
    p.add_argument("-sc", "--scale", type=int, default=1)
    p.add_argument("-l_sc", "--loss_scale", type=int, default=1)
    p.add_argument("-l_de", "--loss_derivative", type=int, default=0)
    p.add_argument("-blurr", "--blurr", type=int, default=0)
    p.add_argument("-pp", "--p_pred", type=int, default=0)
    p.add_argument("-n", "--noise", type=float, default=0.0)
    p.add_argument("-deb", "--debug", type=int, default=0)
    p.add_argument("-net", "--network", type=str, default="newfluidnet")
    p.add_argument("-spectral", "--spectral_conv", type=int, default=0)
    p.add_argument("-l2", "--l2_reg", type=float, default=0.0)
    p.add_argument("-d_r", "--drop_rate", type=float, default=0.0)
    p.add_argument("-roll", "--roll_forward", type=int, default=1)
    p.add_argument("-scales", "--multi_scales", type=float, nargs="+",
                   default=[])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--nn_dir", type=str, default="./trained_networks")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the hermetic synthetic dataset")
    p.add_argument("--n_devices", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from ..constants import SimParams
    from ..data import SnapshotDataset, TimePairDataset, synthetic_store
    from ..models.registry import ModelConfig
    from ..train.trainer import TrainConfig, Trainer
    from ..utils.jit import enable_compilation_cache

    enable_compilation_cache()

    mc = ModelConfig(
        network=args.network, levels=args.levels, c_h=args.c_h,
        act_fn=args.act_fn, r_p=args.r_p, loss_type=args.loss_type,
        use_symm=bool(args.use_symm), dilation=args.dilation,
        a_bound=args.a_bound, repeats=args.repeats, kernel=args.kernel,
        p_pred=bool(args.p_pred), spectral_conv=bool(args.spectral_conv),
        blurr=bool(args.blurr), drop_rate=args.drop_rate,
        factor=args.factor, multi_scales=tuple(args.multi_scales))

    # epoch / milestone derivation (multigpu.py:1059-1070) — single
    # source of truth in TrainConfig.schedule_for
    epochs, milestones = TrainConfig.schedule_for(args.network,
                                                  bool(args.debug))
    if args.epochs is not None:
        epochs = args.epochs

    cfg = TrainConfig(
        model=mc, epochs=epochs, batch_size=args.batch_size,
        milestones=milestones, l2_reg=args.l2_reg,
        loss_scale=bool(args.loss_scale),
        loss_derivative=bool(args.loss_derivative),
        roll_forward=args.roll_forward, debug=bool(args.debug),
        n_devices=args.n_devices)

    is_unet = args.network in ("unet", "iunet")
    if args.synthetic or args.data_dir is None:
        params = [SimParams(3.0, 1e8, 10.0), SimParams(1.0, 1e7, 3.0)]
        tr_store = synthetic_store(params_list=params, n_snapshots=24,
                                   seed=0)
        cv_store = synthetic_store(params_list=params[:1], n_snapshots=8,
                                   seed=1)
        init_store = synthetic_store(params_list=params, n_snapshots=4,
                                     seed=2)
    else:
        from ..data.torch_io import load_store
        tr_store = load_store(args.data_dir, "train",
                              debug=bool(args.debug),
                              p_pred=bool(args.p_pred))
        cv_store = load_store(args.data_dir, "cv", debug=bool(args.debug),
                              p_pred=bool(args.p_pred))
        init_store = (None if args.debug else load_store(
            args.data_dir, "train", is_init=True,
            p_pred=bool(args.p_pred)))

    if is_unet:
        train_ds = TimePairDataset(tr_store, roll_forward=args.roll_forward,
                                   p_pred=bool(args.p_pred))
        cv_ds = TimePairDataset(cv_store, roll_forward=args.roll_forward,
                                p_pred=bool(args.p_pred))
        init_tr = init_cv = None
    elif "transolver" in args.network:
        from ..data import UnstructuredDataset
        train_ds = UnstructuredDataset(tr_store, scale=bool(args.scale),
                                       p_pred=bool(args.p_pred))
        cv_ds = UnstructuredDataset(cv_store, scale=bool(args.scale),
                                    p_pred=bool(args.p_pred))
        init_tr = init_cv = None
    elif args.network == "convae":
        from ..data import ConvAEDataset
        train_ds = ConvAEDataset(tr_store, scale=bool(args.scale))
        cv_ds = ConvAEDataset(cv_store, scale=bool(args.scale))
        init_tr = init_cv = None
    else:
        train_ds = SnapshotDataset(tr_store, scale=bool(args.scale),
                                   p_pred=bool(args.p_pred),
                                   noise=args.noise)
        cv_ds = SnapshotDataset(cv_store, scale=bool(args.scale),
                                p_pred=bool(args.p_pred))
        init_tr = (SnapshotDataset(init_store, scale=bool(args.scale),
                                   p_pred=bool(args.p_pred))
                   if init_store is not None else None)
        init_cv = init_tr

    if "transolver" in args.network or args.network == "vit":
        import dataclasses as _dc
        cfg = _dc.replace(cfg, model=_dc.replace(
            cfg.model, H=tr_store.T.shape[1], W=tr_store.T.shape[2]))

    trainer = Trainer(cfg, train_ds, cv_ds, train_data_init=init_tr,
                      cv_data_init=init_cv, nn_dir=args.nn_dir,
                      restart=bool(args.restart))
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
