"""On-device eigensolves for reversible transition matrices.

A reversible T (detailed balance against pi, as produced by the
``transpose`` and ``mle`` builders) is similar to the symmetric matrix
``S = D^{1/2} T D^{-1/2}`` with ``D = diag(pi)``, so its spectrum is
real and computable with the TPU-supported symmetric eigensolver
(``jnp.linalg.eigh``); for large sparse problems LOBPCG iterates only
matvecs. Left eigenvectors of T recover as ``phi_i = D^{1/2} u_i``.

This replaces the scipy dense/ARPACK path
(enspara/msm/transition_matrices.py:173) on the device for the top-k
implied-timescales workload (BASELINE.md: 'eigsolve seconds for top-20
timescales').
"""

import numpy as np
import scipy.sparse

from .transition_matrices import eigenspectrum as _eigenspectrum_host

__all__ = ['eigenspectrum_reversible', 'implied_timescales_device']


def eigenspectrum_reversible(T, pi=None, n_eigs=None, method='auto'):
    """Top eigenvalues/left-eigenvectors of a reversible T.

    Parameters
    ----------
    T : (n, n) row-stochastic reversible matrix (dense or scipy sparse).
    pi : (n,) stationary distribution. If None, computed from the
        symmetrization identity pi_i T_ij = pi_j T_ji via row sums of
        the counts-like matrix (falls back to host eigs).
    n_eigs : number of leading eigenpairs (default: all).
    method : 'auto' | 'eigh' | 'lobpcg'.

    Returns ``(vals, vecs)`` with vals sorted descending and
    ``vecs[:, 0]`` normalized to sum 1 (the equilibrium populations) —
    the same contract as ``eigenspectrum(..., left=True)``.
    """
    import jax.numpy as jnp

    sparse_in = scipy.sparse.issparse(T)
    n = T.shape[0]
    if n_eigs is None:
        n_eigs = n

    if pi is None:
        # without pi we cannot symmetrize; defer to the host solver
        return _eigenspectrum_host(T, n_eigs=n_eigs, left=True)

    pi = np.asarray(pi, dtype=np.float64).reshape(-1)
    if np.any(pi <= 0):
        # zero-population states break the similarity transform
        return _eigenspectrum_host(T, n_eigs=n_eigs, left=True)

    if method == 'auto':
        method = 'lobpcg' if (sparse_in and n > 4096
                              and n_eigs < n // 8) else 'eigh'

    sqrt_pi = np.sqrt(pi)

    if method == 'eigh':
        T_dense = T.toarray() if sparse_in else np.asarray(T)
        S = (sqrt_pi[:, None] * T_dense) / sqrt_pi[None, :]
        # S should be symmetric for reversible T; enforce numerically
        Sj = jnp.asarray((S + S.T) * 0.5, jnp.float32)
        w, u = jnp.linalg.eigh(Sj)
        w = np.asarray(w, dtype=np.float64)[::-1][:n_eigs]
        u = np.asarray(u, dtype=np.float64)[:, ::-1][:, :n_eigs]
    else:
        from jax.experimental.sparse.linalg import lobpcg_standard

        T_csr = T.tocsr() if sparse_in else scipy.sparse.csr_matrix(T)
        S = scipy.sparse.diags(sqrt_pi) @ T_csr @ \
            scipy.sparse.diags(1.0 / sqrt_pi)
        S = ((S + S.T) * 0.5).tocsr()
        from jax.experimental import sparse as jsparse
        S_bcoo = jsparse.BCOO.from_scipy_sparse(S.astype(np.float32))

        # LOBPCG finds the largest eigenvalues of a PSD operator; shift
        # by +1 so the spectrum (in [-1, 1]) is positive. Guard
        # vectors: convergence error concentrates in the trailing
        # block, so solve a wider block and discard the extras.
        k_guard = int(min(n - 1, n_eigs + max(8, n_eigs // 2)))

        def matvec(X):
            return S_bcoo @ X + X

        rng = np.random.default_rng(0)
        X0 = jnp.asarray(rng.normal(size=(n, k_guard)), jnp.float32)
        _, U, _ = lobpcg_standard(matvec, X0, m=200)

        # fp32 LOBPCG stalls near residuals ~1e-3 on clustered MSM
        # spectra; polish on the host with one fp64 subspace-iteration
        # step + exact Rayleigh-Ritz over the returned block (cheap:
        # O(nnz * k) sparse matvecs + a k x k dense eigh).
        S64 = S.astype(np.float64)
        V = np.asarray(U, dtype=np.float64)
        V, _ = np.linalg.qr(S64 @ V + V)
        H = V.T @ (S64 @ V)
        w_all, Z = np.linalg.eigh((H + H.T) * 0.5)
        order = np.argsort(-w_all)[:n_eigs]
        w = w_all[order]
        u = V @ Z[:, order]

    # left eigenvectors of T: phi_i = sqrt(pi) * u_i
    vecs = sqrt_pi[:, None] * u
    vecs[:, 0] /= vecs[:, 0].sum()
    return w, vecs


def implied_timescales_device(assigns, lag_times, method, n_times=None,
                              sliding_window=True, trim=False):
    """Implied timescales using the device eigensolver for each lag.

    ``method`` must produce reversible T with eq probs (builders.mle or
    builders.transpose). Falls back to the host path per-lag when
    reversibility can't be established.
    """
    from .transition_matrices import assigns_to_counts, trim_disconnected

    if hasattr(assigns, '_data'):
        n_states = int(assigns._data.max()) + 1
    else:
        n_states = int(np.max(np.asarray(assigns))) + 1
    if n_times is None:
        n_times = int(np.floor(n_states / 10.0)) + 1
    if n_times > n_states - 1:
        n_times = n_states - 1

    out = []
    for lag in lag_times:
        C = assigns_to_counts(assigns, max_n_states=n_states,
                              lag_time=lag,
                              sliding_window=sliding_window)
        if trim:
            _, C = trim_disconnected(C)
        _, T, pi = method(C)
        vals, _ = eigenspectrum_reversible(T, pi=pi,
                                           n_eigs=n_times + 1)
        out.append(-lag / np.log(np.clip(vals[1:n_times + 1],
                                         1e-300, None)))
    return np.array(out)
