"""Native C++ image-op kernel vs numpy reference."""
import numpy as np

from textboost_tpu.data.native import get_lib, normalize_u8


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    out = normalize_u8(arr)
    ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert out.dtype == np.float32


def test_large_multithreaded():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
    out = normalize_u8(arr, threads=8)
    ref = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_library_builds():
    # The environment ships g++; the native path should actually engage.
    assert get_lib() is not None, "native image_ops failed to build with g++"
