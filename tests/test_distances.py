import numpy as np
import pytest
from numpy.testing import assert_allclose

from enspara_tpu.geometry import libdist
from enspara_tpu.ops import distances as dops
from enspara_tpu.exception import DataInvalid


def test_libdist_euclidean_matches_scipy_style():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 7))
    y = rng.normal(size=7)
    want = np.sqrt(((X - y) ** 2).sum(1))
    got = libdist.euclidean(X, y)
    assert got.dtype == np.float64
    assert_allclose(got, want, rtol=1e-12)


def test_libdist_out_contract():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(10, 3))
    y = rng.normal(size=3)
    out = np.zeros(10, dtype=np.float64)
    res = libdist.euclidean(X, y, out=out)
    assert res is out
    with pytest.raises(DataInvalid):
        libdist.euclidean(X, y, out=np.zeros(10, dtype=np.float32))
    with pytest.raises(DataInvalid):
        libdist.euclidean(X, y, out=np.zeros(11, dtype=np.float64))
    with pytest.raises(DataInvalid):
        libdist.euclidean(X, np.zeros(5))
    with pytest.raises(DataInvalid):
        libdist.euclidean(X[0], y)


def test_libdist_manhattan_hamming():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(20, 5))
    y = rng.normal(size=5)
    assert_allclose(libdist.manhattan(X, y),
                    np.abs(X - y).sum(1), rtol=1e-12)
    Xi = rng.integers(0, 3, size=(20, 9))
    yi = rng.integers(0, 3, size=9)
    assert_allclose(libdist.hamming(Xi, yi), (Xi != yi).mean(1))


def test_device_to_point_kernels():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(33, 6)).astype(np.float32)
    y = rng.normal(size=6).astype(np.float32)
    assert_allclose(np.asarray(dops.euclidean_to_point(X, y)),
                    np.sqrt(((X - y) ** 2).sum(1)), rtol=1e-5)
    assert_allclose(np.asarray(dops.manhattan_to_point(X, y)),
                    np.abs(X - y).sum(1), rtol=1e-5)


def test_device_pairwise_matches_numpy():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(40, 8)).astype(np.float32)
    Y = rng.normal(size=(11, 8)).astype(np.float32)
    for metric in ('euclidean', 'manhattan'):
        want = dops.pairwise_distance_np(X, Y, metric)
        got = np.asarray(dops.pairwise_distance(X, Y, metric))
        assert got.shape == (40, 11)
        assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    Xi = rng.integers(0, 3, size=(40, 8))
    Yi = rng.integers(0, 3, size=(11, 8))
    assert_allclose(np.asarray(dops.pairwise_distance(Xi, Yi, 'hamming')),
                    dops.pairwise_distance_np(Xi, Yi, 'hamming'),
                    rtol=1e-6)


def test_pairwise_euclidean_identical_points():
    X = np.ones((5, 4), dtype=np.float32)
    d = np.asarray(dops.pairwise_euclidean(X, X))
    assert_allclose(d, np.zeros((5, 5)), atol=1e-4)
