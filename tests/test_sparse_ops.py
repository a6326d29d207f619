"""Unit tests for the sparse device operands (ops/sparse.py):
dense scatter materialization is covered in test_tpt; here the ELL
conversion + streaming SpMM used by the LOBPCG matvec."""

import numpy as np
import pytest
import scipy.sparse

from enspara_tpu.ops.sparse import ell_from_sparse, ell_spmm


def _random_sym(n, density, seed):
    S = scipy.sparse.random(n, n, density=density, random_state=seed,
                            format='csr')
    return (S + S.T).tocsr()


def test_ell_from_sparse_roundtrip():
    S = _random_sym(500, 0.01, 0)
    cols, vals = ell_from_sparse(S)
    n = S.shape[0]
    w = int(np.diff(S.indptr).max())
    assert cols.shape == (n, w) and vals.shape == (n, w)
    # reconstruct and compare
    R = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        np.add.at(R[i], cols[i], vals[i])
    assert np.allclose(R, S.toarray(), atol=1e-6)


def test_ell_pad_slots_are_inert():
    # a row with zero entries and a hub row: pads must carry value 0
    # and an in-bounds column index
    S = scipy.sparse.csr_matrix(
        np.array([[0, 0, 0], [1, 2, 3], [0, 4, 0]], dtype=np.float64))
    cols, vals = ell_from_sparse(S)
    assert cols.shape == (3, 3)
    assert (cols >= 0).all() and (cols < 3).all()
    # row 0 entirely pads; row 2 has two pads
    assert (vals[0] == 0).all()
    assert np.count_nonzero(vals[2]) == 1


def test_ell_spmm_matches_scipy():
    import jax.numpy as jnp

    S = _random_sym(800, 0.005, 1)
    cols, vals = ell_from_sparse(S)
    rng = np.random.default_rng(2)
    X = rng.normal(size=(800, 17)).astype(np.float32)
    Y = np.asarray(ell_spmm(jnp.asarray(cols), jnp.asarray(vals),
                            jnp.asarray(X)))
    Yref = S.toarray().astype(np.float32) @ X
    assert np.allclose(Y, Yref, atol=1e-4)
    # shifted form (the LOBPCG +1-shift)
    Ys = np.asarray(ell_spmm(jnp.asarray(cols), jnp.asarray(vals),
                             jnp.asarray(X), shift=1.0))
    assert np.allclose(Ys, Yref + X, atol=1e-4)


def test_ell_spmm_duplicate_entries_summed():
    import jax.numpy as jnp

    # COO input with duplicate coordinates: conversion must sum them
    row = np.array([0, 0, 1])
    col = np.array([1, 1, 0])
    dat = np.array([2.0, 3.0, 4.0])
    S = scipy.sparse.coo_matrix((dat, (row, col)), shape=(2, 2))
    cols, vals = ell_from_sparse(S)
    X = np.eye(2, dtype=np.float32)
    Y = np.asarray(ell_spmm(jnp.asarray(cols), jnp.asarray(vals),
                            jnp.asarray(X)))
    assert np.allclose(Y, np.array([[0, 5], [4, 0]], dtype=np.float32))


def test_lobpcg_hub_fallback_routing():
    """A hub-dominated graph (one dense row) must route the LOBPCG
    matvec to BCOO, not ELL — verified indirectly: the solve still
    returns certified eigenpairs."""
    from enspara_tpu.msm.eigen_device import eigenspectrum_reversible

    n = 600
    rng = np.random.default_rng(3)
    C = scipy.sparse.random(n, n, density=0.01, random_state=3,
                            format='lil')
    C[0, :] = rng.random(n)        # hub row
    C[:, 0] = rng.random(n)[:, None]
    C = C.tocsr() + scipy.sparse.eye(n) * 10.0
    C_sym = C + C.T
    row = np.asarray(C_sym.sum(axis=1)).ravel()
    T = scipy.sparse.diags(1.0 / row) @ C_sym
    pi = row / row.sum()
    w, v, info = eigenspectrum_reversible(
        T.tocsr(), pi=pi, n_eigs=5, method='lobpcg', return_info=True)
    assert info['method'] == 'filtered'
    assert np.all(np.asarray(info['residuals']) < 1e-6)
    assert abs(w[0] - 1.0) < 1e-8


def test_lobpcg_tiny_matrix_routes_to_eigh():
    """LOBPCG requires 5*search_dim < n; tiny systems (e.g. a 4-state
    MSM from the bundled CLI data) must reroute to eigh instead of
    raising (regression: found driving the CLI end-to-end)."""
    from enspara_tpu.msm.eigen_device import eigenspectrum_reversible

    T = np.array([[0.8, 0.1, 0.05, 0.05],
                  [0.1, 0.8, 0.05, 0.05],
                  [0.05, 0.05, 0.8, 0.1],
                  [0.05, 0.05, 0.1, 0.8]])
    # symmetric T: pi uniform
    pi = np.full(4, 0.25)
    w, v, info = eigenspectrum_reversible(
        scipy.sparse.csr_matrix(T), pi=pi, n_eigs=3, method='lobpcg',
        return_info=True)
    assert info['method'] == 'eigh'
    w_host = np.sort(np.linalg.eigvalsh(T))[::-1]
    assert np.allclose(w[:3], w_host[:3], atol=1e-5)


def test_ell_spmm_wide_rows_fori_path():
    """w > 32 takes the fori_loop lowering; results must match the
    unrolled path's semantics exactly."""
    import jax.numpy as jnp

    n, w = 200, 48
    rng = np.random.default_rng(5)
    dense = np.zeros((n, n))
    for i in range(n):
        cols_i = rng.choice(n, size=w, replace=False)
        dense[i, cols_i] = rng.normal(size=w)
    S = scipy.sparse.csr_matrix(dense)
    cols, vals = ell_from_sparse(S)
    assert cols.shape[1] == w
    X = rng.normal(size=(n, 9)).astype(np.float32)
    Y = np.asarray(ell_spmm(jnp.asarray(cols), jnp.asarray(vals),
                            jnp.asarray(X), shift=0.5))
    Yref = dense.astype(np.float32) @ X + 0.5 * X
    assert np.allclose(Y, Yref, atol=1e-4)
