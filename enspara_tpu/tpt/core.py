"""Committor probabilities and mean first passage times.
(reference: enspara/tpt/core.py)

Linear solves run as dense fp32 LU on device (one MXU factorization)
refined to fp64 accuracy with cheap sparse host residuals — direct
SuperLU factorization of MSM graphs suffers catastrophic fill-in
(ring + shortcut topologies take minutes at 10k states where the MXU
takes well under a second). Systems too big to densify fall back to
the scipy host path.
"""

import logging
import warnings

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from ..citation import cite
from ..msm.transition_matrices import eq_probs

logger = logging.getLogger(__name__)

__all__ = ['committors', 'mfpts']

# densify absorbing-state solves on device up to this many states
# (n^2 fp32 = 1 GB at 16k; past that, host sparse LU)
_DENSE_SOLVE_MAX_STATES = 16384


def _device_solve_profitable():
    """The dense LU path pays off on accelerators (10k-state factor +
    solve ~0.25 s on one v5e vs ~70 s SuperLU with fill-in); on the
    CPU backend XLA's LU loses to SuperLU, so keep the host path."""
    try:
        import jax
        return jax.default_backend() != 'cpu'
    except Exception:
        return False


def _dense_on_device(sp):
    """Materialize a sparse matrix DENSE IN HBM by scattering its COO
    triplets on device — the host never builds (or ships) the n^2
    array, so a 10k-state system uploads ~nnz values (<1 MB) instead
    of 400 MB of mostly zeros."""
    from ..ops.sparse import dense_on_device
    return dense_on_device(sp)


def _lu_jitted():
    """Module-cached jitted LU factor/solve — committors/mfpts call
    these per query, and a fresh ``jax.jit`` wrapper per call would
    re-trace (and round-trip the remote compile cache) every time."""
    global _LU_FNS
    if _LU_FNS is None:
        import jax
        import jax.scipy.linalg as jsl
        _LU_FNS = (jax.jit(jsl.lu_factor), jax.jit(jsl.lu_solve))
    return _LU_FNS


_LU_FNS = None


def _absorbing_csr_system(tprob, sinks, sources, all_absorbing):
    """Build (I - Q) with absorbing rows/cols zeroed and unit diagonal,
    plus the right-hand side R, entirely in CSR arithmetic — O(nnz)
    with C-speed kernels. The previous LIL formulation (mirroring the
    reference, tpt/core.py:60-67) spent seconds per 10k-state query on
    python-loop row surgery."""
    n = tprob.shape[0]
    Tc = tprob.tocsr()
    R = np.asarray(Tc[:, sinks].todense(), dtype=np.float64)
    R[sinks] = 1.0
    R[sources] = 0.0

    # unique: a state listed in both sources and sinks (or duplicated
    # within either) must still get diagonal exactly 1.0, matching the
    # reference's LIL assignment semantics (tpt/core.py:60-67) rather
    # than accumulating one per occurrence
    absorbing_unique = np.unique(all_absorbing)
    keep = np.ones(n)
    keep[absorbing_unique] = 0.0
    D = scipy.sparse.diags(keep)
    A = scipy.sparse.eye(n, format='csr') - Tc
    A = (D @ A @ D).tocsr()
    A = A + scipy.sparse.coo_matrix(
        (np.ones(absorbing_unique.shape[0]),
         (absorbing_unique, absorbing_unique)), shape=(n, n))
    A = A.tocsr()
    A.eliminate_zeros()
    return A, R


def _refined_solve(A_dense32, B, A_exact=None, max_refine=10,
                   rtol=1e-10):
    """Solve A x = B via one device fp32 LU factorization plus fp64
    iterative refinement: r = B - A x is computed in fp64 against
    ``A_exact`` (sparse or dense), and the correction reuses the LU.
    Returns fp64 x with ~fp64 accuracy for the well-conditioned
    M-matrix systems TPT produces, or None if refinement stalls
    (caller falls back to a host sparse solve)."""
    import jax

    if A_exact is None:
        A_exact = A_dense32
    B = np.asarray(B, dtype=np.float64)
    b1d = B.ndim == 1
    Bm = B[:, None] if b1d else B

    if isinstance(A_dense32, jax.Array):
        A32 = A_dense32                 # already fp32 in HBM
    else:
        A32 = A_dense32.astype(np.float32)
    factor, solve = _lu_jitted()
    lu, piv = factor(A32)

    x = np.asarray(solve((lu, piv),
                         Bm.astype(np.float32))).astype(np.float64)
    bnorm = max(np.abs(Bm).max(), 1e-300)
    prev = np.inf
    for _ in range(max_refine):
        r = Bm - A_exact @ x
        rnorm = np.abs(r).max()
        if rnorm <= rtol * bnorm:
            return x[:, 0] if b1d else x
        if rnorm >= prev * 0.5:     # stalled: fp32 LU too inaccurate
            return None
        prev = rnorm
        dx = np.asarray(solve((lu, piv), r.astype(np.float32)))
        x = x + dx
    return None


def _I_m_Q(tprob, absorbing_states, n_states=None):
    """(I - Q) with absorbing rows/cols zeroed and unit diagonal.
    (reference: tpt/core.py:25)"""
    if n_states is None:
        n_states = len(tprob)
    I_m_Q = np.eye(n_states) - np.asarray(tprob)
    I_m_Q[:, absorbing_states] = 0.0
    I_m_Q[absorbing_states, :] = 0.0
    I_m_Q[absorbing_states, absorbing_states] = 1.0
    return I_m_Q


@cite('tpt')
def committors(tprob, sources, sinks):
    """Forward committors q+ of the reaction sources -> sinks: the
    probability each state reaches a sink before a source, from the
    absorbing-state linear solve (I-Q) x = R.
    (reference: tpt/core.py:40)"""
    sources = np.array(sources, dtype=int).reshape(-1)
    sinks = np.array(sinks, dtype=int).reshape(-1)
    all_absorbing = np.append(sources, sinks)

    is_sparse = scipy.sparse.issparse(tprob)
    n_states = tprob.shape[0]

    if is_sparse:
        I_m_Q, R = _absorbing_csr_system(tprob, sinks, sources,
                                         all_absorbing)

        B = None
        if (n_states <= _DENSE_SOLVE_MAX_STATES
                and _device_solve_profitable()):
            B = _refined_solve(_dense_on_device(I_m_Q), R,
                               A_exact=I_m_Q)
            if B is None:
                logger.info('fp32 refinement stalled; falling back '
                            'to host sparse LU')
        if B is None:
            with warnings.catch_warnings():
                warnings.simplefilter('ignore')
                try:
                    # MSM graphs have (near-)symmetric patterns: the
                    # A+A^T minimum-degree ordering cuts SuperLU
                    # fill-in ~3x vs the default COLAMD on the
                    # 10k-state ring+shortcut benchmark (10.6 -> 3.3 s)
                    lu = scipy.sparse.linalg.splu(
                        I_m_Q.tocsc(), permc_spec='MMD_AT_PLUS_A')
                    B = lu.solve(np.asarray(R, dtype=np.float64))
                except Exception:
                    B = scipy.sparse.linalg.spsolve(
                        I_m_Q, scipy.sparse.csc_matrix(R))
            if scipy.sparse.issparse(B):
                B = B.toarray()
        q = np.asarray(B).reshape(n_states, sinks.shape[0]).sum(axis=1)
    else:
        dense = np.asarray(tprob, dtype=float)
        R = dense[:, sinks].copy()
        R[sinks] = 1.0
        R[sources] = 0.0
        I_m_Q = _I_m_Q(dense, all_absorbing, n_states=n_states)
        B = None
        if n_states >= 64 and _device_solve_profitable():
            B = _refined_solve(I_m_Q, R)
        if B is None:
            B = np.linalg.solve(I_m_Q, R)
        q = B.reshape(n_states, sinks.shape[0]).sum(axis=1)

    q[sinks] = 1.0
    return q


def mfpts(tprob, sinks=None, populations=None, lagtime=1.):
    """Mean first passage times, all-to-all (fundamental matrix) or to a
    sink set (absorbing solve). (reference: tpt/core.py:105)"""
    tprob = tprob.toarray() if scipy.sparse.issparse(tprob) \
        else np.asarray(tprob, dtype=float)
    n_states = len(tprob)
    if populations is None:
        populations = eq_probs(tprob)

    if sinks is None:
        W = np.array([populations] * n_states)
        Z = np.linalg.inv(np.eye(n_states) - tprob + W)
        return lagtime * (np.diag(Z) - Z) / W

    sinks = np.array(sinks, dtype=int).reshape(-1)
    I_m_Q = _I_m_Q(tprob, sinks, n_states=n_states)
    c = np.ones(n_states)
    c[sinks] = 0
    if n_states >= 64 and _device_solve_profitable():
        x = _refined_solve(I_m_Q, c)
        if x is not None:
            return lagtime * x
    return lagtime * np.linalg.solve(I_m_Q, c)
