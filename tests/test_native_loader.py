"""Native C++ npy batch-assembly vs numpy fallback equivalence."""

import os

import numpy as np
import pytest

from bist_tpu.native.loader import (
    assemble_feature_batch, native_available, probe_npy_shape)


@pytest.fixture
def npy_dir(tmp_path, rng):
    shapes = [(5, 4, 8), (12, 4, 8), (1, 4, 8)]
    paths = []
    arrays = []
    for i, s in enumerate(shapes):
        a = rng.standard_normal(s).astype(np.float32)
        p = tmp_path / f"v{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        arrays.append(a)
    return paths, arrays


def test_probe_shape(npy_dir):
    paths, arrays = npy_dir
    for p, a in zip(paths, arrays):
        assert probe_npy_shape(p) == a.shape


def test_assemble_pads_and_truncates(npy_dir):
    paths, arrays = npy_dir
    out = assemble_feature_batch(paths, t_pad=8, tail_shape=(4, 8))
    assert out.shape == (3, 8, 4, 8)
    np.testing.assert_array_equal(out[0, :5], arrays[0])
    np.testing.assert_array_equal(out[0, 5:], 0.0)
    np.testing.assert_array_equal(out[1], arrays[1][:8])   # truncated
    np.testing.assert_array_equal(out[2, :1], arrays[2])
    np.testing.assert_array_equal(out[2, 1:], 0.0)


def test_native_compiles_here():
    """The toolchain is in the image; the native path must actually build."""
    assert native_available(), "g++ build of npy_loader.cpp failed"


def test_native_matches_python_fallback(npy_dir, monkeypatch):
    paths, _ = npy_dir
    if not native_available():
        pytest.skip("no native lib")
    native = assemble_feature_batch(paths, t_pad=6, tail_shape=(4, 8))
    import bist_tpu.native.loader as L
    monkeypatch.setattr(L, "_lib", None)
    monkeypatch.setattr(L, "_build_failed", True)
    python = L.assemble_feature_batch(paths, t_pad=6, tail_shape=(4, 8))
    np.testing.assert_array_equal(native, python)
