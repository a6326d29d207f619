"""Rotamer featurizer: atomic trajectories -> integer rotamer state
trajectories. (reference: enspara/cards/featurizers.py)"""

import logging

from .. import geometry

logger = logging.getLogger(__name__)

__all__ = ['RotamerFeaturizer']


class RotamerFeaturizer(object):
    """Assign every dihedral in every frame to a rotamer state (CARDS
    definition), exposing ``feature_trajectories_``,
    ``n_feature_states_`` and ``atom_indices_`` after fit().

    Accepts lists or generators of trajectories.
    """

    __slots__ = ['buffer_width', 'n_procs', 'feature_trajectories_',
                 'n_feature_states_', 'atom_indices_']

    def __init__(self, buffer_width=15, n_procs=1):
        self.buffer_width = buffer_width
        self.n_procs = n_procs

    def fit(self, trajectories):
        trj_iter = iter(trajectories)
        first_trj = next(trj_iter)
        rotamer_trj, atom_inds, rotamer_n_states = \
            geometry.all_rotamers(first_trj,
                                  buffer_width=self.buffer_width)

        rotamer_trajs = [rotamer_trj]
        rotamer_trajs.extend(
            geometry.all_rotamers(t, buffer_width=self.buffer_width)[0]
            for t in trj_iter)

        self.feature_trajectories_ = rotamer_trajs
        self.n_feature_states_ = rotamer_n_states
        self.atom_indices_ = atom_inds
        return self
