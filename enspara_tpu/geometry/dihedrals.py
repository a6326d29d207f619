"""Dihedral-angle discovery and computation.

Standalone replacement for the mdtraj ``compute_phi/psi/chi1-4``
functions the reference reaches through geometry/rotamer.py:6. Atom
quartets are discovered from the topology with the standard residue
templates; the dihedral evaluation itself is a vectorized
arctan2-of-cross-products over (n_frames, n_dihedrals) — device-ready.
"""

import numpy as np

__all__ = ['compute_dihedrals', 'compute_phi', 'compute_psi',
           'compute_chi1', 'compute_chi2', 'compute_chi3',
           'compute_chi4', 'atom_quartets']

# standard chi-angle atom-name templates (one match per residue, first
# template that matches wins)
_CHI_TEMPLATES = {
    1: [['N', 'CA', 'CB', 'CG'], ['N', 'CA', 'CB', 'CG1'],
        ['N', 'CA', 'CB', 'SG'], ['N', 'CA', 'CB', 'OG'],
        ['N', 'CA', 'CB', 'OG1']],
    2: [['CA', 'CB', 'CG', 'CD'], ['CA', 'CB', 'CG', 'CD1'],
        ['CA', 'CB', 'CG1', 'CD1'], ['CA', 'CB', 'CG', 'OD1'],
        ['CA', 'CB', 'CG', 'ND1'], ['CA', 'CB', 'CG', 'SD']],
    3: [['CB', 'CG', 'CD', 'NE'], ['CB', 'CG', 'CD', 'CE'],
        ['CB', 'CG', 'CD', 'OE1'], ['CB', 'CG', 'SD', 'CE']],
    4: [['CG', 'CD', 'NE', 'CZ'], ['CG', 'CD', 'CE', 'NZ']],
}


def _residue_atom_map(res):
    return {a.name: a.index for a in res.atoms}


def atom_quartets(top, kind):
    """(n_dihedrals, 4) atom-index quartets for 'phi', 'psi' or
    'chi1'..'chi4'."""
    quartets = []
    if kind in ('phi', 'psi'):
        for chain in top.chains:
            residues = chain.residues
            for i in range(len(residues)):
                cur = _residue_atom_map(residues[i])
                if kind == 'phi':
                    if i == 0:
                        continue
                    prev = _residue_atom_map(residues[i - 1])
                    names = [prev.get('C'), cur.get('N'), cur.get('CA'),
                             cur.get('C')]
                else:
                    if i == len(residues) - 1:
                        continue
                    nxt = _residue_atom_map(residues[i + 1])
                    names = [cur.get('N'), cur.get('CA'), cur.get('C'),
                             nxt.get('N')]
                if all(n is not None for n in names):
                    quartets.append(names)
    elif kind.startswith('chi'):
        order = int(kind[3])
        for res in top.residues:
            amap = _residue_atom_map(res)
            for template in _CHI_TEMPLATES[order]:
                idx = [amap.get(n) for n in template]
                if all(i is not None for i in idx):
                    quartets.append(idx)
                    break
    else:
        raise ValueError('Unknown dihedral kind %r' % kind)
    return np.array(quartets, dtype=int).reshape(-1, 4)


def compute_dihedrals(traj, quartets, use_device=None):
    """Dihedral angles in radians, (n_frames, n_quartets), range
    (-pi, pi]."""
    xyz = traj.xyz if hasattr(traj, 'xyz') else np.asarray(traj)
    quartets = np.asarray(quartets, dtype=int)
    if len(quartets) == 0:
        return np.zeros((len(xyz), 0), dtype=np.float32)

    if use_device is None:
        use_device = xyz.shape[0] * quartets.shape[0] > 200_000
    if use_device:
        import jax.numpy as jnp
        x = jnp.asarray(xyz)
        return np.asarray(_dihedrals_impl(x, quartets, jnp))
    return _dihedrals_impl(xyz, quartets, np)


def _dihedrals_impl(xyz, quartets, xp):
    p0 = xyz[:, quartets[:, 0]]
    p1 = xyz[:, quartets[:, 1]]
    p2 = xyz[:, quartets[:, 2]]
    p3 = xyz[:, quartets[:, 3]]
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    c1 = xp.cross(b2, b3)
    c2 = xp.cross(b1, b2)
    p1v = xp.sum(b1 * c1, axis=-1) * xp.sqrt(xp.sum(b2 * b2, axis=-1))
    p2v = xp.sum(c1 * c2, axis=-1)
    return xp.arctan2(p1v, p2v).astype(xyz.dtype)


def _make_compute(kind):
    def compute(traj, periodic=True, **kwargs):
        q = atom_quartets(traj.top, kind)
        angles = compute_dihedrals(traj, q)
        return q, angles
    compute.__name__ = 'compute_%s' % kind
    compute.__doc__ = ('Quartet indices and %s angles (radians) for '
                       'every applicable residue.' % kind)
    return compute


compute_phi = _make_compute('phi')
compute_psi = _make_compute('psi')
compute_chi1 = _make_compute('chi1')
compute_chi2 = _make_compute('chi2')
compute_chi3 = _make_compute('chi3')
compute_chi4 = _make_compute('chi4')
