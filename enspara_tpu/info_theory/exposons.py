"""Exposons: clusters of residues whose solvent exposure changes
cooperatively. (reference: enspara/info_theory/exposons.py)

Pipeline: atomic SASAs (device Shrake-Rupley kernel,
:mod:`enspara_tpu.geometry.sasa`) -> per-sidechain condensation ->
exposed/buried dichotomy -> weighted MI -> AffinityPropagation
(sklearn, fixed random_state=0 for determinism, matching the
publication's behavior).
"""

import logging

import numpy as np
from sklearn.cluster import AffinityPropagation

from .. import exception
from ..citation import cite
from .mutual_info import weighted_mi

logger = logging.getLogger(__name__)

__all__ = ['exposons', 'exposons_from_sasas', 'condense_sidechain_sasas',
           'get_sidechain_atom_ids']


@cite('exposons')
def exposons(trj, damping, weights=None, probe_radius=0.28,
             threshold=0.02, mesh=None):
    """Compute exposons for a trajectory (enspara_tpu.io.Trajectory).
    (reference: exposons.py:16)

    Returns ``(sasa_mi, exposon_labels)``.
    """
    from ..geometry.sasa import shrake_rupley

    if weights is None:
        weights = np.full((len(trj),), 1 / len(trj))
    else:
        weights = np.array(weights) / sum(weights)

    sasas = shrake_rupley(trj, probe_radius=probe_radius, mode='atom',
                          mesh=mesh)
    sasas = condense_sidechain_sasas(sasas, trj.top)
    return exposons_from_sasas(sasas, damping, weights, threshold)


@cite('exposons')
def exposons_from_sasas(sasas, damping, weights, threshold):
    """Exposons from precomputed sidechain SASAs.
    (reference: exposons.py:86)"""
    sasa_mi = weighted_mi(sasas > threshold, weights)

    c = AffinityPropagation(
        damping=damping,
        affinity='precomputed',
        preference=0,
        max_iter=10000,
        random_state=0)
    c.fit(sasa_mi)

    return sasa_mi, c.labels_


_BACKBONE_NAMES = frozenset(
    ['N', 'C', 'CA', 'O', 'HA', 'H', 'H1', 'H2', 'H3', 'OXT'])


def get_sidechain_atom_ids(top):
    """Per-residue lists of sidechain atom ids (everything but the
    backbone names). (reference: exposons.py:135)"""
    sc_ids = []
    for res in top.residues:
        ids = np.array([a.index for a in res.atoms
                        if a.name not in _BACKBONE_NAMES], dtype=int)
        sc_ids.append(ids)
    return sc_ids


@cite('exposons')
def condense_sidechain_sasas(sasas, top):
    """Sum atomic SASAs into per-residue sidechain SASAs.
    (reference: exposons.py:179)"""
    if top.n_residues <= 1:
        raise exception.DataInvalid(
            'Topology must have more than one residue.')
    if top.n_atoms != sasas.shape[1]:
        raise exception.DataInvalid(
            "The number of atoms in top (%s) didn't match the number of "
            "SASAs provided (%s). Make sure you computed atom-level "
            "SASAs (mode='atom') and that you've passed the correct "
            'topology file and array of SASAs'
            % (top.n_atoms, sasas.shape[1]))

    sc_ids = get_sidechain_atom_ids(top)
    rsd_sasas = np.zeros((sasas.shape[0], len(sc_ids)), dtype='float32')
    for i, aa in enumerate(sc_ids):
        if len(aa) == 0:
            logger.warning('Found 0 sidechain atoms for residue %s.', i)
            continue
        rsd_sasas[:, i] = np.sum(sasas[:, aa], axis=1)
    return rsd_sasas
