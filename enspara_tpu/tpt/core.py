"""Committor probabilities and mean first passage times.
(reference: enspara/tpt/core.py)

Dense problems solve on device (jnp.linalg.solve); sparse inputs use the
scipy host path (absorbing-state linear solves are graph-shaped work).
"""

import warnings

import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from ..citation import cite
from ..msm.transition_matrices import eq_probs

__all__ = ['committors', 'mfpts']


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
        tprob_lil = tprob.tolil()
        R = tprob_lil[:, sinks]
        R[sinks] = 1.0
        R[sources] = 0.0

        I_m_Q = scipy.sparse.eye(n_states, format='lil') - tprob_lil
        I_m_Q[:, all_absorbing] = 0.0
        I_m_Q[all_absorbing, :] = 0.0
        I_m_Q[all_absorbing, all_absorbing] = 1.0
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            B = scipy.sparse.linalg.spsolve(I_m_Q.tocsr(), R.tocsc())
        if scipy.sparse.issparse(B):
            B = B.toarray()
        q = np.asarray(B).reshape(n_states, sinks.shape[0]).sum(axis=1)
    else:
        dense = np.asarray(tprob, dtype=float)
        R = dense[:, sinks].copy()
        R[sinks] = 1.0
        R[sources] = 0.0
        I_m_Q = _I_m_Q(dense, all_absorbing, n_states=n_states)
        if n_states >= 64:
            import jax.numpy as jnp
            B = np.asarray(jnp.linalg.solve(
                jnp.asarray(I_m_Q), jnp.asarray(R)))
        else:
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
    return lagtime * np.linalg.solve(I_m_Q, c)
