"""Alpha-helix axis vectors and per-residue orthogonal frames.
(reference: enspara/geometry/helix.py)
"""

import numpy as np

from ..exception import ImproperlyConfigured

__all__ = ['calculate_piecewise_helix_vectors',
           'calculate_summary_helix_vectors',
           'angles_from_plane_projection', 'angles_from_vecs']


def _get_unit_vectors(vecs):
    mags = np.sqrt(np.einsum('ij,ij->i', vecs, vecs))
    return vecs / mags[:, None]


def _running_window_means(coords, n_avg):
    """Means over sliding windows of n_avg coordinates.
    Window count matches the reference's (n_coords - n_avg - 1)
    (helix.py:141-151)."""
    n_windows = coords.shape[1] - n_avg - 1
    return np.stack([coords[:, i:i + n_avg].mean(axis=1)
                     for i in range(n_windows)], axis=1)


def _generate_vectors_from_coords(coords, n_avg=4):
    """Helix direction per frame from backbone coordinates: consecutive
    differences of window means, averaged and normalized.
    (reference: helix.py:152)"""
    win = _running_window_means(coords, n_avg)
    vecs = (win[:, :-1] - win[:, 1:]).mean(axis=1)
    return _get_unit_vectors(vecs)


def _get_backbone_nums(top, resnums):
    out = []
    for res in np.sort(resnums):
        for name in ('N', 'CA', 'C'):
            sel = top.select('resSeq %d and name %s' % (res, name))
            out.append(sel[0])
    return np.array(out)


def _get_CA_nums(top, resnums):
    return np.array([top.select('resSeq %d and name CA' % r)[0]
                     for r in resnums])


def calculate_piecewise_helix_vectors(trj, helix_resnums=None,
                                      helix_start=None, helix_end=None):
    """Unit vectors along a helix for each frame plus helix centers.
    (reference: helix.py:5)"""
    if helix_resnums is None and (helix_start is None
                                  or helix_end is None):
        raise ImproperlyConfigured(
            "Either 'helix_resnums' or 'helix_start' and 'helix_end' "
            'are required.')
    if helix_resnums is None:
        helix_resnums = np.arange(helix_start, helix_end + 1)
    backbone_nums = _get_backbone_nums(trj.topology, helix_resnums)
    backbone_coords = trj.xyz[:, backbone_nums]
    vectors = _generate_vectors_from_coords(backbone_coords, n_avg=12)
    center_coords = backbone_coords.mean(axis=1)
    return vectors, center_coords


def _get_ref_vectors(normal_vecs, vec_points, ref_points):
    """(reference: helix.py:210)"""
    a_m_p = vec_points[:, None, :] - ref_points
    a_m_p_dot_n = np.einsum('ijk,ijk->ij', a_m_p,
                            normal_vecs[:, None, :])
    return np.array([
        _get_unit_vectors(
            a_m_p[:, i, :] - normal_vecs * a_m_p_dot_n[:, i][:, None])
        for i in range(a_m_p.shape[1])])


def calculate_summary_helix_vectors(trj, res_refs, helix_resnums=None,
                                    helix_start=None, helix_end=None):
    """Helix axis + per-reference-residue orthogonal frame vectors.
    (reference: helix.py:48)"""
    top = trj.topology
    atom_refs = _get_CA_nums(top, res_refs)
    helix_vectors, helix_centers = calculate_piecewise_helix_vectors(
        trj, helix_resnums=helix_resnums, helix_start=helix_start,
        helix_end=helix_end)
    ref_points = trj.xyz[:, atom_refs]
    ref_vectors = _get_ref_vectors(helix_vectors, helix_centers,
                                   ref_points)
    cross_vectors = np.cross(ref_vectors, helix_vectors)
    return helix_vectors, ref_vectors, cross_vectors, helix_centers


def angles_from_plane_projection(vectors, v1, v2, degree=True):
    """(reference: helix.py:97)"""
    projection1 = np.einsum('ij,ij->i', vectors, [v1])
    projection2 = np.einsum('ij,ij->i', vectors, [v2])
    projection_vector = np.stack([projection1, projection2], axis=1)
    mags = np.sqrt(np.einsum('ij,ij->i', projection_vector,
                             projection_vector))
    dot_prods = np.einsum('ij,ij->i', projection_vector, [[1, 0]])
    angles = np.arccos(np.around(dot_prods / mags, 5))
    angles[projection2 < 0] *= -1
    if degree:
        angles = np.degrees(angles)
    return angles, mags


def angles_from_vecs(vecs, to=0):
    """Angles between every vector and vecs[to].
    (reference: helix.py:112)"""
    mags = np.sqrt(np.einsum('ij,ij->i', vecs, vecs))
    dot_prods = np.einsum('ij,ij->i', vecs, [vecs[to]])
    return np.arccos(np.around(dot_prods / mags[to] / mags, 5))
