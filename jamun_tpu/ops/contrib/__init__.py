"""Contributed / vendored-equivalent op libraries.

`equifold` ports the reference's vendored EquiFold l<=1 fast-path modules
(`/root/reference/src/jamun/e3tools/contrib/equifold/`) onto dense masked
pair arrays.
"""

from jamun_tpu.ops.contrib.equifold import (
    BesselBasis,
    Convnet,
    DTPByHead,
    Equiformer,
    RadialNN,
    SinusoidalBasis,
    SVLayerNorm,
    SVLinear,
)

__all__ = [
    "BesselBasis",
    "Convnet",
    "DTPByHead",
    "Equiformer",
    "RadialNN",
    "SinusoidalBasis",
    "SVLayerNorm",
    "SVLinear",
]
