"""Counts -> transition-probability builders, uniform signature
``(C, prior_counts, calculate_eq_probs) -> (C, T, eq_probs)``.
(reference: enspara/msm/builders.py)

All builders are container-polymorphic: scipy sparse matrices in give
the same sparse type out; ndarrays give ndarrays.

``mle_device`` is the TPU-side Jacobi reformulation of the Prinz MLE:
every (i, j) pair updates from the current row sums simultaneously
(vectorized over the whole matrix), converging to the same
detailed-balance fixed point as the sequential Gauss-Seidel kernel.
"""

import logging
import warnings

import numpy as np
import scipy.sparse

from ..citation import cite
from .transition_matrices import eq_probs
from .libmsm import _mle_prinz_dense

logger = logging.getLogger(__name__)

__all__ = ['mle', 'transpose', 'normalize', 'mle_device']


@cite('prinz-mle')
def mle(C, prior_counts=None, calculate_eq_probs=True):
    """Detailed-balance maximum-likelihood estimator (Prinz).
    (reference: builders.py:24)"""
    C = _apply_prior_counts(C, prior_counts)

    sparsetype = np.array
    if scipy.sparse.issparse(C):
        sparsetype = type(C)
        C = np.asarray(C.todense())

    if not calculate_eq_probs:
        warnings.warn('MLE method cannot suppress calculation of '
                      'equilibrium probabilities, since they are '
                      'calculated together.', category=RuntimeWarning)
        T, equilibrium = _mle_prinz_dense(C)
        equilibrium = None
    else:
        T, equilibrium = _mle_prinz_dense(C)

    C = sparsetype(C)
    T = sparsetype(T)
    return C, T, equilibrium


def transpose(C, prior_counts=None, calculate_eq_probs=True):
    """Symmetrization estimator: T = rownorm(C + C.T), eq from row sums.
    (reference: builders.py:83)"""
    C = _apply_prior_counts(C, prior_counts)

    C_sym = C + C.T
    probs = _row_normalize(C_sym)

    if type(C) is not type(probs):
        probs = type(C)(probs)
        C_sym = type(C)(C_sym)

    equilibrium = None
    if calculate_eq_probs:
        equilibrium = np.array(C_sym.sum(axis=1) / C_sym.sum()).flatten()

    # scalar multiply (not divide) so integer sparse types upcast to
    # float instead of truncating the half-counts
    return C_sym * 0.5, probs, equilibrium


def normalize(C, prior_counts=None, calculate_eq_probs=True):
    """Simple row normalization; eq probs from the top left eigenvector.
    (reference: builders.py:123)"""
    C = _apply_prior_counts(C, prior_counts)

    probs = _row_normalize(C)

    equilibrium = None
    if calculate_eq_probs:
        equilibrium = eq_probs(probs)

    return C, probs, equilibrium


def _apply_prior_counts(C, prior_counts):
    """(reference: builders.py:160)"""
    if prior_counts is not None:
        try:
            C = C + prior_counts
        except NotImplementedError:
            C = np.array(C.todense()) + prior_counts
    return C


def _row_normalize(C):
    """(reference: builders.py:171)"""
    n_states = C.shape[0]

    if scipy.sparse.issparse(C):
        C_csr = scipy.sparse.csr_matrix(C).asfptype()
        weights = np.asarray(C_csr.sum(axis=1)).flatten()
        inv_weights = np.zeros(n_states)
        inv_weights[weights > 0] = 1.0 / weights[weights > 0]
        inv_weights = scipy.sparse.dia_matrix(
            (inv_weights, 0), C_csr.shape).tocsr()
        T = inv_weights.dot(C_csr)
        T = type(C)(T)
    else:
        C = np.array(C)
        weights = np.asarray(C.sum(axis=1)).flatten()
        inv_weights = np.zeros(n_states)
        inv_weights[weights > 0] = 1.0 / weights[weights > 0]
        T = C * inv_weights.reshape((n_states, 1))
    return T


def mle_device(C, prior_counts=None, calculate_eq_probs=True,
               tol=1e-11, max_iter=2000):
    """Jacobi-style on-device Prinz MLE: all (i, j) pair updates computed
    simultaneously from the current row sums, then row sums refreshed
    exactly — a fixed-point iteration with the same detailed-balance
    stationary point as the Gauss-Seidel kernel, but fully vectorized for
    the VPU. Roughly O(n^2) per sweep with no sequential dependence.

    Returns the same (C, T, eq) triple as :func:`mle`.
    """
    import jax
    import jax.numpy as jnp

    C_in = _apply_prior_counts(C, prior_counts)
    if scipy.sparse.issparse(C_in):
        C_arr = np.asarray(C_in.todense(), dtype=np.float32)
        recast = type(C_in)
    else:
        C_arr = np.asarray(C_in, dtype=np.float32)
        recast = np.array

    Cj = jnp.asarray(C_arr)
    C_rs = jnp.sum(Cj, axis=1)
    Csym = Cj + Cj.T

    def sweep(_, X):
        X_rs = jnp.sum(X, axis=1)
        # diagonal update (independent per state)
        denom = C_rs - jnp.diag(Cj)
        diag_new = jnp.where(
            denom > 0,
            jnp.diag(Cj) * (X_rs - jnp.diag(X)) / jnp.maximum(denom, 1e-30),
            jnp.diag(X))
        X = X.at[jnp.diag_indices_from(X)].set(diag_new)
        X_rs = jnp.sum(X, axis=1)

        # all-pairs quadratic-root update from current row sums
        a = (C_rs[:, None] - Cj) + (C_rs[None, :] - Cj.T)
        b = (C_rs[:, None] * (X_rs[None, :] - X)
             + C_rs[None, :] * (X_rs[:, None] - X)
             - Csym * (X_rs[:, None] + X_rs[None, :] - 2 * X))
        c = -Csym * (X_rs[:, None] - X) * (X_rs[None, :] - X)
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        v = jnp.where(jnp.abs(a) > 1e-30,
                      (-b + jnp.sqrt(disc)) / (2 * a), X)
        # keep the diagonal from the diagonal pass; Jacobi-average the
        # off-diagonal update for stability
        v = 0.5 * (v + v.T)
        off = ~jnp.eye(X.shape[0], dtype=bool)
        X_new = jnp.where(off, 0.5 * X + 0.5 * v, X)
        return X_new

    X0 = Csym
    X = jax.lax.fori_loop(0, max_iter, sweep, X0)
    X_rs = jnp.sum(X, axis=1)
    T = X / X_rs[:, None]
    pi = X_rs / jnp.sum(X_rs)

    T = np.asarray(T, dtype=np.float64)
    T /= T.sum(axis=1, keepdims=True)
    pi = np.asarray(pi, dtype=np.float64)
    pi /= pi.sum()
    eq = pi if calculate_eq_probs else None
    return recast(C_arr), recast(T), eq
