"""Real spherical harmonics with e3nn "component" normalization.

Input vectors are in (x, y, z) coordinate order; the l=1 output block is in
(y, z, x) component order to match the real irrep basis of `jamun_tpu.ops.cg`.
Built by recursive coupling Y_l ~ w3j(1, l-1, l) . (Y_1 (x) Y_{l-1}) with
host-precomputed normalization constants, so arbitrary lmax works under jit.

Reference parity: `e3nn.o3.SphericalHarmonics(normalize=True,
normalization="component")` at `/root/reference/src/jamun/model/arch/e3conv.py:41`.
"""

from __future__ import annotations

import math
from typing import Union

import jax.numpy as jnp
import numpy as np

from jamun_tpu.ops.cg import real_wigner_3j, sh_normalization_constant
from jamun_tpu.ops.irreps import Irreps

__all__ = ["spherical_harmonics"]


def spherical_harmonics(
    irreps_sh: Union[str, Irreps],
    vectors: jnp.ndarray,
    normalize: bool = True,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Evaluate spherical harmonics for every (mul=1) block of `irreps_sh`.

    vectors: [..., 3] in (x, y, z). Returns [..., irreps_sh.dim]. Component
    normalization: |Y_l|^2 = 2l+1 on the unit sphere; Y_0 = 1, Y_1 = sqrt(3)*n
    (components ordered y, z, x).
    """
    irreps_sh = Irreps(irreps_sh)
    if normalize:
        norm = jnp.linalg.norm(vectors, axis=-1, keepdims=True)
        vectors = vectors / jnp.maximum(norm, eps)

    lmax = irreps_sh.lmax
    # Build Y_l for all l up to lmax once; reuse across blocks.
    ys = {0: jnp.ones(vectors.shape[:-1] + (1,), dtype=vectors.dtype)}
    if lmax >= 1:
        y1 = math.sqrt(3.0) * vectors[..., jnp.array([1, 2, 0])]
        ys[1] = y1
        for l in range(2, lmax + 1):
            C = jnp.asarray(real_wigner_3j(1, l - 1, l), dtype=vectors.dtype)
            c_l = sh_normalization_constant(l)
            ys[l] = c_l * jnp.einsum("ijk,...i,...j->...k", C, y1, ys[l - 1])

    blocks = []
    for mi in irreps_sh:
        if mi.mul != 1:
            blocks.extend([ys[mi.ir.l]] * mi.mul)
        else:
            blocks.append(ys[mi.ir.l])
    return jnp.concatenate(blocks, axis=-1)


def spherical_harmonics_np(irreps_sh, vectors: np.ndarray, normalize: bool = True) -> np.ndarray:
    """Numpy twin of `spherical_harmonics` for host-side tests."""
    out = spherical_harmonics(irreps_sh, jnp.asarray(vectors, dtype=jnp.float64 if vectors.dtype == np.float64 else jnp.float32), normalize=normalize)
    return np.asarray(out)
