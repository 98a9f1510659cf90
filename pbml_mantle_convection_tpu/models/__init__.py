from .fluidnet import (  # noqa: F401
    FluidNet, HalfNewFluidNet, MultiScaleNewFluidNet, NewFluidNet)
from .layers import (  # noqa: F401
    BoundaryLearnedConvolution2D, Conv2dTorch, FluidLayer, SpectralConv2d,
    SpectralFluidLayer, SymmetricConv2d)
from .unet import ConvAE, Unet  # noqa: F401
