"""Functional single-epoch training loop.

Equivalent of the reference's ``one_epoch_AD`` helper
(pycold-checkpoint.py:85-233) used by the ViT/Transolver experiment
notebooks: a plain function that drives one epoch over a dataset with a
prebuilt train/eval step — no Trainer object, no checkpointing.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def one_epoch(
    params,
    opt_state,
    dataset,
    rng: np.random.Generator,
    batch_size: int,
    train_step=None,
    eval_step=None,
) -> Tuple:
    """Run one epoch. With ``train_step`` the parameters are updated; with
    only ``eval_step`` the loop is evaluation-only (the reference's
    ``is_train`` switch). Returns (params, opt_state, mean 6-column loss).
    """
    losses = np.zeros(6)
    n = 0
    for batch in dataset.epoch_batches(rng, batch_size):
        if train_step is not None:
            params, opt_state, br = train_step(params, opt_state, batch)
        else:
            br = eval_step(params, batch)
        losses += np.asarray([float(x) for x in br])
        n += 1
    return params, opt_state, (losses / max(n, 1)).tolist()
