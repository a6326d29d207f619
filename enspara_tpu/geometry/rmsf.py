"""Population-weighted RMSF. (reference: enspara/geometry/rmsf.py)"""

import itertools

import numpy as np

__all__ = ['rmsf_calc']


def rmsf_calc(centers, populations=None, ref_frame=0, per_residue=True,
              atom_indices=None):
    """Population-weighted RMSF of MSM cluster centers relative to a
    reference frame. (reference: rmsf.py:6)

    Returns per-residue (default) or per-atom RMSFs.
    """
    centers = centers.copy().superpose(centers[ref_frame],
                                       atom_indices=atom_indices)

    if populations is None:
        populations = np.ones(centers.n_frames) / centers.n_frames
    populations = np.asarray(populations)

    diffs = centers.xyz - centers.xyz[ref_frame]
    dists_per_atom_sq = np.einsum('ijk,ijk->ij', diffs, diffs)

    if per_residue:
        avg_resi = np.array([
            dists_per_atom_sq[:, [a.index for a in r.atoms]].mean(axis=1)
            for r in centers.top.residues])
        return np.sqrt((avg_resi * populations).sum(axis=1))
    return np.sqrt((dists_per_atom_sq * populations[:, None]).sum(axis=0))


def _bfactors_from_rmsfs(pdb, rmsfs):
    """(reference: rmsf.py:66)"""
    return np.concatenate([
        list(itertools.repeat(rmsf, r.n_atoms))
        for rmsf, r in zip(rmsfs, pdb.top.residues)])
