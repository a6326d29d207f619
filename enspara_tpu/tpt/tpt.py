"""Reactive fluxes and populations from transition path theory.
(reference: enspara/tpt/tpt.py)
"""

import numpy as np
from scipy import sparse

from .core import committors
from ..msm.transition_matrices import eq_probs

__all__ = ['reactive_fluxes', 'net_fluxes', 'reactive_populations']


def _get_data_from_tprob(tprob, sources, sinks, populations):
    """(reference: tpt/tpt.py:26)"""
    sources = np.array(sources).reshape(-1)
    sinks = np.array(sinks).reshape(-1)
    if populations is None:
        populations = eq_probs(tprob)
    n_states = len(populations)
    forward_committors = committors(tprob, sources, sinks)
    reverse_committors = 1 - forward_committors
    return populations, n_states, forward_committors, reverse_committors


def reactive_fluxes(tprob, sources, sinks, populations=None):
    """Flux along each edge: f_ij = pi_i q-_i T_ij q+_j, zero diagonal.
    (reference: tpt/tpt.py:48)"""
    populations, n_states, fq, rq = _get_data_from_tprob(
        tprob, sources, sinks, populations)

    if sparse.issparse(tprob):
        fluxes = tprob.multiply((populations * rq)[:, None]) \
            .multiply(fq).tolil()
    else:
        fluxes = np.asarray(tprob) * ((populations * rq)[:, None]) * fq

    fluxes[(np.arange(n_states), np.arange(n_states))] = \
        np.zeros(n_states)
    return fluxes


def net_fluxes(tprob, sources, sinks, populations=None):
    """max(f - f.T, 0). (reference: tpt/tpt.py:94)

    The sparse path clips in CSR data directly — O(nnz), never
    materializing the dense matrix (the reference masks a lil matrix
    with a dense boolean array, tpt/tpt.py:94+)."""
    fluxes = reactive_fluxes(tprob, sources, sinks,
                             populations=populations)
    if sparse.issparse(fluxes):
        f = fluxes.tocsr()
        net = (f - f.T).tocsr()
        net.data[net.data < 0] = 0.0
        net.eliminate_zeros()
        net = net.tolil()       # container parity with the reference
    else:
        net = fluxes - fluxes.T
        net[np.where(net < 0)] = 0
    return net


def reactive_populations(tprob, sources, sinks, populations=None):
    """Probability a state appears on a reactive path:
    pi_i q+_i q-_i, normalized. (reference: tpt/tpt.py:128)"""
    populations, n_states, fq, rq = _get_data_from_tprob(
        tprob, sources, sinks, populations)
    densities = populations * fq * rq
    return densities / np.sum(densities)
