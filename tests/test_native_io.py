"""Native trajio extension tests (built on demand with g++)."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def test_native_dcd_roundtrip_and_python_interop(tmp_path):
    native = pytest.importorskip("jamun_tpu.data._native_io")
    from jamun_tpu.data.dcd import read_dcd as py_read_dcd, write_dcd as py_write_dcd

    rng = np.random.default_rng(0)
    pos = (rng.standard_normal((5, 17, 3)) * 0.4).astype(np.float32)
    p1 = str(tmp_path / "native.dcd")
    native.write_dcd(p1, pos)
    np.testing.assert_allclose(native.read_dcd(p1), pos, atol=1e-6)
    # python reader parses native-written files and vice versa
    np.testing.assert_allclose(py_read_dcd(p1), pos, atol=1e-6)
    p2 = str(tmp_path / "python.dcd")
    py_write_dcd(p2, pos)
    np.testing.assert_allclose(native.read_dcd(p2), pos, atol=1e-6)


def test_native_xtc_roundtrip(tmp_path):
    native = pytest.importorskip("jamun_tpu.data._native_io")
    rng = np.random.default_rng(1)
    pos = (rng.standard_normal((4, 33, 3)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.xtc")
    native.write_xtc(p, pos, precision=1000.0)
    back = native.read_xtc(p)
    assert back.shape == pos.shape
    # quantized at 1e-3 nm
    np.testing.assert_allclose(back, pos, atol=6e-4)


def test_xtc_via_dataset_loader(tmp_path):
    pytest.importorskip("jamun_tpu.data._native_io")
    from jamun_tpu.data.datasets import _load_traj_positions
    from jamun_tpu.data._native_io import write_xtc

    pos = (np.random.default_rng(2).standard_normal((3, 8, 3)) * 0.3).astype(np.float32)
    p = str(tmp_path / "traj.xtc")
    write_xtc(p, pos)
    loaded = _load_traj_positions(p)
    np.testing.assert_allclose(loaded, pos, atol=6e-4)
