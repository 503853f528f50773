"""GROMACS XTC trajectory reading.

Placeholder: the xdrfile 3dfcoord codec is implemented natively in
`native/trajio` (C++); until that extension is built, .xtc files raise with a
conversion hint. (Timewarp/MDGen headline datasets use .npz / .dcd.)
"""

from __future__ import annotations

import numpy as np


def read_xtc(path: str) -> np.ndarray:
    try:
        from jamun_tpu.data._native_io import read_xtc as _native_read_xtc
    except ImportError as e:
        raise NotImplementedError(
            "XTC reading requires the native trajio extension (build with "
            "`python -m jamun_tpu.data.build_native`); alternatively convert "
            "the trajectory to .dcd or .npz"
        ) from e
    return _native_read_xtc(path)
