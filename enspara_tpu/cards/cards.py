"""CARDS: Correlation of All Rotameric and Dynamical States.
(reference: enspara/cards/cards.py)

Pipeline: rotamer featurization (device associative-scan hysteresis) ->
order/disorder segmentation -> four MI matrices (ss, dd, sd, ds) via
the one-hot-matmul joint-count kernel.
"""

import logging

import numpy as np

from ..citation import cite
from ..info_theory import mutual_info
from . import disorder
from .featurizers import RotamerFeaturizer

logger = logging.getLogger(__name__)

__all__ = ['cards', 'cards_matrices']


@cite('cards')
def cards(trajectories, buffer_width=15, n_procs=1):
    """Structural, disorder, and cross MI matrices for all dihedral
    pairs across a set of trajectories. Returns
    ``(structural_mi, disorder_mi, struct_to_disorder_mi,
    disorder_to_struct_mi, atom_inds)``. (reference: cards.py:17)"""
    r = RotamerFeaturizer(buffer_width=buffer_width, n_procs=n_procs)
    r.fit(trajectories)
    return cards_matrices(r.feature_trajectories_,
                          r.n_feature_states_,
                          n_procs) + (r.atom_indices_,)


@cite('cards')
def cards_matrices(feature_trajs, n_feature_states, n_procs=None):
    """The four CARDS MI matrices from rotamer state trajectories.
    (reference: cards.py:61)"""
    disordered_trajs, disorder_n_states = \
        disorder.assign_order_disorder(feature_trajs)

    # stage both featurizations onto the device ONCE — the four MI
    # matrices below reuse them (re-pushing per matrix costs 4x the
    # host->device traffic)
    try:
        import jax
        import jax.numpy as jnp
        feature_trajs = [jnp.asarray(np.asarray(t, dtype=np.int32))
                         for t in feature_trajs]
        disordered_trajs = [jnp.asarray(np.asarray(t, dtype=np.int32))
                            for t in disordered_trajs]
    except ImportError:
        pass

    logger.debug('Calculating structural mutual information')
    structural_mi = mutual_info.mi_matrix(
        feature_trajs, feature_trajs,
        n_feature_states, n_feature_states)

    logger.debug('Calculating disorder mutual information')
    disorder_mi = mutual_info.mi_matrix(
        disordered_trajs, disordered_trajs,
        disorder_n_states, disorder_n_states)

    logger.debug('Calculating structure-disorder mutual information')
    struct_to_disorder_mi = mutual_info.mi_matrix(
        feature_trajs, disordered_trajs,
        n_feature_states, disorder_n_states)

    logger.debug('Calculating disorder-structure mutual information')
    disorder_to_struct_mi = mutual_info.mi_matrix(
        disordered_trajs, feature_trajs,
        disorder_n_states, n_feature_states)

    return (structural_mi, disorder_mi, struct_to_disorder_mi,
            disorder_to_struct_mi)
