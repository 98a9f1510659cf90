"""Frank-Kamenetskii viscosity law and its input featurization.

Reference: pytorch_networks_convae.py:86-102 (``eta_torch``),
datasetio.py:25-27 (``eta``), datasetio.py:268, 619-634 (featurization).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import visc_feature


def fk_viscosity(gamma, beta, z, T, Tref=0.0, zref=0.0):
    """eta = exp(ln(gamma)*(Tref - T) + ln(beta)*(z - zref)).

    gamma is the temperature viscosity contrast (fkt), beta the depth
    contrast (fkp), and ``z`` the depth coordinate (the reference passes
    ``1 - yc``). Reference: pytorch_networks_convae.py:86-102.
    """
    return jnp.exp(jnp.log(gamma) * (Tref - T) + jnp.log(beta) * (z - zref))


def fk_viscosity_clipped(gamma, beta, z, T, lo=1e-8, hi=1.0):
    """FK viscosity clipped to the surrogate's training range
    (reference: pytorch_networks_convae.py:389, datasetio.py:619)."""
    return jnp.clip(fk_viscosity(gamma, beta, z, T), lo, hi)


def fk_viscosity_feature(gamma, beta, z, T):
    """log10(clip(eta, 1e-8, 1)) / 8 input channel
    (reference: datasetio.py:268, pytorch_networks_convae.py:389-394)."""
    return visc_feature(fk_viscosity(gamma, beta, z, T))
