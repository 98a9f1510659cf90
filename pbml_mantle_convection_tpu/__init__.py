"""pbml_mantle_convection_tpu — TPU-native physics-based ML framework for
2-D mantle convection.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
agsiddhant/PBML_Mantle_Convection: neural Stokes surrogates (FluidNet
family, U-Net, ConvAE, Transolver, ViT), an explicit advection–diffusion
energy stepper, a fully on-device coupled rollout engine (the GAIA-coupled
loop as one jitted ``lax.scan``), shard_map data-parallel training over a
TPU mesh, and a native C++ simulation engine exposing the GAIA ``Direct``
state contract.
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
