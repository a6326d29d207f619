import numpy as np
from numpy.testing import assert_allclose

from enspara_tpu.msm import builders
from enspara_tpu.msm.eigen_device import (eigenspectrum_reversible,
                                          implied_timescales_device)
from enspara_tpu.msm.transition_matrices import eigenspectrum
from enspara_tpu.msm.timescales import implied_timescales


def _reversible(n, seed=0):
    rng = np.random.default_rng(seed)
    C = rng.integers(1, 50, size=(n, n)).astype(float)
    _, T, pi = builders.mle(C)
    return T, pi


def test_eigh_path_matches_host():
    T, pi = _reversible(40)
    vals_h, vecs_h = eigenspectrum(T, n_eigs=6, left=True)
    vals_d, vecs_d = eigenspectrum_reversible(T, pi=pi, n_eigs=6,
                                              method='eigh')
    assert_allclose(vals_d, vals_h, atol=1e-5)
    assert_allclose(vecs_d[:, 0], vecs_h[:, 0], atol=1e-6)
    # remaining left eigenvectors equal up to sign
    for k in range(1, 6):
        a, b = vecs_d[:, k], vecs_h[:, k]
        s = np.sign(a @ b)
        assert_allclose(a * s / np.linalg.norm(a),
                        b / np.linalg.norm(b), atol=1e-4)


def test_no_pi_falls_back_to_host():
    T, pi = _reversible(10)
    vals, vecs = eigenspectrum_reversible(T, pi=None, n_eigs=3)
    vals_h, _ = eigenspectrum(T, n_eigs=3, left=True)
    assert_allclose(vals, vals_h, atol=1e-12)


def test_implied_timescales_device_matches_host():
    rng = np.random.default_rng(1)
    assigns = rng.integers(0, 5, size=(3, 400))
    host = implied_timescales(assigns, [1, 2, 4],
                              method=builders.mle, n_times=2)
    dev = implied_timescales_device(assigns, [1, 2, 4],
                                    method=builders.mle, n_times=2)
    assert_allclose(dev, host, rtol=1e-3)
