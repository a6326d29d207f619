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

__all__ = ['eigenspectrum_reversible', 'implied_timescales_device',
           'implied_timescales_batched']


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
        if sparse_in:
            # the similarity transform D T D^-1 is value-local: scale
            # the COO triplets on host (O(nnz)) and scatter dense in
            # HBM — no host n^2 passes, no dense upload
            from ..ops.sparse import dense_on_device
            Sd = dense_on_device(T, scale_rows=sqrt_pi,
                                 scale_cols=1.0 / sqrt_pi)
            Sj = (Sd + Sd.T) * 0.5      # symmetrize on device
        else:
            S = (sqrt_pi[:, None] * np.asarray(T)) / sqrt_pi[None, :]
            # S should be symmetric for reversible T; enforce
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


def _counts_at_traced_lag(a, m, lag, n_states, sliding_window):
    """Masked lag-pair counts with the lag as a TRACED scalar: the end
    frame is produced by a roll instead of a static slice, so one
    compiled program serves every lag and the whole lag scan vmaps.
    Semantics match :func:`assigns_to_counts_device` on padded rows
    (pairs never cross rows or padding; -1 frames contribute nothing).
    """
    import jax.numpy as jnp

    L = a.shape[1]
    t = jnp.arange(L)
    end = jnp.roll(a, -lag, axis=1)
    m_end = jnp.roll(m, -lag, axis=1)
    valid = (m & m_end & (t[None, :] + lag < L)
             & (a >= 0) & (end >= 0))
    if not sliding_window:
        valid = valid & (t[None, :] % lag == 0)
    flat_idx = jnp.where(valid, a * n_states + end, n_states ** 2)
    counts = jnp.bincount(flat_idx.reshape(-1),
                          length=n_states ** 2 + 1)[:-1]
    return counts.reshape(n_states, n_states).astype(jnp.float32)


def implied_timescales_batched(assigns, lag_times, n_times=None,
                               sliding_window=True, prior_counts=None,
                               n_states=None, mesh=None):
    """Implied timescales for EVERY lag in one compiled device launch.

    The TPU-native formulation of the reference's serial per-lag loop
    (enspara/msm/timescales.py:88-92): lag-pair counting vmaps over
    lags (the lag is traced, see :func:`_counts_at_traced_lag`), the
    transpose-builder algebra (``T = rownorm(C + C^T)``, eq from row
    sums — builders.py:83 semantics incl. the zero-row guard) is pure
    batched array math, and the reversible eigensolve runs as ONE
    batched symmetrized ``eigh`` over the (n_lags, n, n) stack. One
    dispatch replaces n_lags dependent chains — on a tunneled/remote
    host this also removes n_lags round-trip latencies.

    Restrictions vs :func:`implied_timescales_device`: transpose
    builder only (MLE's Gauss-Seidel is host-sequential) and no
    ergodic trimming (SCC is a host graph algorithm whose output shape
    is lag-dependent). Gapped (-1) data follows the padded-counting
    semantics, not the reference's gap compaction.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the lag axis is
    sharded across the mesh and the assignments are replicated — each
    chip runs its lag subset of the SAME batched program (GSPMD
    propagates the input sharding through the vmap), the multi-chip
    form of the reference's "embarrassingly parallel over lags" note
    (timescales.py:12-16).

    Returns (n_lags, n_times) float64, like ``implied_timescales``.
    """
    import jax
    import jax.numpy as jnp

    from ..ra import to_padded

    padded = to_padded(assigns)
    a = np.asarray(padded.data, dtype=np.int32)
    m = np.asarray(padded.mask, dtype=bool)

    if n_states is None:
        n_states = int(a[m].max()) + 1
    if n_times is None:
        n_times = int(np.floor(n_states / 10.0)) + 1
    if n_times > n_states - 1:
        n_times = n_states - 1
    lags = np.asarray(lag_times, dtype=np.int32)
    if (lags < 1).any():
        raise ValueError('lag times must be >= 1, got %s' % (lags,))
    prior = np.float32(0.0 if prior_counts is None else prior_counts)

    if mesh is None:
        out = _batched_lags_jit(
            jnp.asarray(a), jnp.asarray(m), jnp.asarray(lags),
            jnp.float32(prior), n_states, n_times,
            bool(sliding_window))
        return np.asarray(out, dtype=np.float64)

    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    n_lags = len(lags)
    pad = (-n_lags) % n_dev
    if pad:                     # pad with lag=1 so every shard is full
        lags = np.concatenate([lags, np.ones(pad, np.int32)])

    aj = jax.device_put(jnp.asarray(a), NamedSharding(
        mesh, PartitionSpec()))                       # replicated
    mj = jax.device_put(jnp.asarray(m), NamedSharding(
        mesh, PartitionSpec()))
    lj = jax.device_put(jnp.asarray(lags), NamedSharding(
        mesh, PartitionSpec(axis)))                   # lag-sharded
    out = _batched_lags_jit(aj, mj, lj, jnp.float32(prior), n_states,
                            n_times, bool(sliding_window))
    return np.asarray(out, dtype=np.float64)[:n_lags]


def _batched_lags_impl(aj, mj, lagsj, prior, n_states, n_times,
                       sliding_window):
    """Jitted once per (shapes, n_states, n_times, window) — defined at
    module level so repeated calls hit the jit cache instead of
    re-tracing a fresh closure each time."""
    import jax
    import jax.numpy as jnp

    def one(lag):
        C = _counts_at_traced_lag(aj, mj, lag, n_states,
                                  sliding_window) + prior
        C_sym = C + C.T
        row = C_sym.sum(axis=1)
        T = C_sym * jnp.where(row > 0, 1.0 / jnp.where(row > 0, row, 1.0),
                              0.0)[:, None]
        pi = row / row.sum()
        sqrt_pi = jnp.sqrt(pi)
        inv_sqrt = jnp.where(sqrt_pi > 0, 1.0 / jnp.where(
            sqrt_pi > 0, sqrt_pi, 1.0), 0.0)
        S = sqrt_pi[:, None] * T * inv_sqrt[None, :]
        S = (S + S.T) * 0.5
        w = jnp.linalg.eigvalsh(S)          # ascending
        # top (n_times + 1): last entries; drop the stationary
        # eigenvalue 1, keep the next n_times
        top = w[::-1][1:n_times + 1]
        # raw reference formula (timescales.py:38): negative
        # eigenvalues yield NaN, unit eigenvalues +/-inf — exactly
        # as the host path does
        return -lag.astype(jnp.float32) / jnp.log(top)
    return jax.vmap(one)(lagsj)


def _make_batched_lags_jit():
    import functools
    import jax
    return jax.jit(_batched_lags_impl,
                   static_argnames=('n_states', 'n_times',
                                    'sliding_window'))


class _LazyJit:
    """Defer jax import until first call, then cache the jitted fn."""

    def __init__(self, maker):
        self._maker = maker
        self._fn = None

    def __call__(self, *args, **kwargs):
        if self._fn is None:
            self._fn = self._maker()
        return self._fn(*args, **kwargs)


_batched_lags_jit = _LazyJit(_make_batched_lags_jit)


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
