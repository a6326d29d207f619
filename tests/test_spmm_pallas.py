"""Correctness of the Pallas sliced-ELL SpMM (interpret mode on the
CPU harness; the real-chip measurement lives in
benchmarks/pallas_spmm.py)."""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from enspara_tpu.ops.sparse import ell_from_sparse
from enspara_tpu.ops.spmm_pallas import ell_spmm_pallas


@pytest.mark.parametrize('n,k,density,seed',
                         [(257, 21, 0.01, 0),     # odd n: row padding
                          (512, 64, 0.005, 1),
                          (100, 130, 0.03, 2)])   # k > one lane group
def test_ell_spmm_pallas_matches_scipy(n, k, density, seed):
    rng = np.random.default_rng(seed)
    A = scipy.sparse.random(n, n, density=density,
                            random_state=seed, format='csr')
    A = A + scipy.sparse.eye(n) * 0.5     # no empty rows
    cols, vals = ell_from_sparse(A)
    X = rng.normal(size=(n, k)).astype(np.float32)

    Y = np.asarray(ell_spmm_pallas(jnp.asarray(cols),
                                   jnp.asarray(vals),
                                   jnp.asarray(X)))
    Yref = (A.astype(np.float64) @ X.astype(np.float64))
    assert np.abs(Y - Yref).max() < 1e-4


def test_ell_spmm_pallas_casts_non_fp32_inputs():
    """fp64/bf16 operands are cast to the kernel's fp32 accumulator
    dtype up front instead of hitting a Mosaic dtype mismatch
    (ADVICE r4)."""
    rng = np.random.default_rng(7)
    A = scipy.sparse.random(65, 65, density=0.05, random_state=7,
                            format='csr') + scipy.sparse.eye(65) * 0.5
    cols, vals = ell_from_sparse(A)
    X64 = rng.normal(size=(65, 12))                    # float64
    Y = np.asarray(ell_spmm_pallas(jnp.asarray(cols),
                                   np.asarray(vals, np.float64),
                                   np.asarray(X64)))
    assert Y.dtype == np.float32
    Yref = A.astype(np.float64) @ X64
    np.testing.assert_allclose(Y, Yref, rtol=2e-5, atol=2e-5)
