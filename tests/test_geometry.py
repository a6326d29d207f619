"""Geometry tests: dihedrals vs analytic values, rotamer hysteresis
(host vs device scan), SASA vs analytic/oracle, RMSF, helix vectors,
pockets on a synthetic cavity."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from enspara_tpu import io
from enspara_tpu.geometry import (dihedrals, rotamer, sasa, rmsf,
                                  helix, pockets)

REF_DATA = '/root/reference/enspara/test/data'
HAVE_REF = os.path.isdir(REF_DATA)


def test_dihedral_analytic():
    # four points with a known 90-degree dihedral
    xyz = np.array([[[0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 0, 1]]],
                   dtype=np.float32)
    ang = dihedrals.compute_dihedrals(xyz, np.array([[0, 1, 2, 3]]))
    assert_allclose(np.degrees(ang[0, 0]), 90, atol=1e-4)
    # mirrored fourth point flips the sign
    xyz_m = xyz.copy()
    xyz_m[0, 3, 2] = -1
    ang_m = dihedrals.compute_dihedrals(xyz_m, np.array([[0, 1, 2, 3]]))
    assert_allclose(np.degrees(ang_m[0, 0]), -90, atol=1e-4)
    # trans (180 degrees)
    xyz = np.array([[[0, 1, 0], [0, 0, 0], [1, 0, 0], [1, -1, 0]]],
                   dtype=np.float32)
    ang = dihedrals.compute_dihedrals(xyz, np.array([[0, 1, 2, 3]]))
    assert_allclose(abs(np.degrees(ang[0, 0])), 180, atol=1e-4)


def test_dihedral_device_matches_host():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(10, 20, 3)).astype(np.float32)
    q = rng.integers(0, 20, size=(15, 4))
    host = dihedrals.compute_dihedrals(xyz, q, use_device=False)
    dev = dihedrals.compute_dihedrals(xyz, q, use_device=True)
    assert_allclose(host, dev, atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_dihedral_quartets_on_reference_pdb():
    pdb = io.load(os.path.join(REF_DATA, 'native.pdb'))
    # ACE-ALA-NME: one phi (ACE C - ALA N - CA - C) and one psi
    phi_q = dihedrals.atom_quartets(pdb.top, 'phi')
    psi_q = dihedrals.atom_quartets(pdb.top, 'psi')
    assert phi_q.shape[0] >= 1
    assert psi_q.shape[0] >= 1


def test_rotamer_hysteresis_host():
    # stays in basin until crossing buffer past the boundary
    bounds = [0, 120, 240, 360]
    angles = np.array([60., 125., 140., 60., 110., 130., 200.])
    states = rotamer._rotamers(angles, bounds, buffer_width=15)
    # 125 and 130 are within the 120+15 buffer -> state keeps 0
    assert_array_equal(states, [0, 0, 1, 0, 0, 0, 1])


def test_rotamer_device_matches_host():
    rng = np.random.default_rng(1)
    for bounds in ([0, 120, 240, 360], [0, 180, 360], [0, 160, 360]):
        angles = rng.random((500, 8)) * 359.4
        host = np.stack(
            [rotamer._rotamers(angles[:, i], bounds, 15)
             for i in range(8)], axis=1)
        dev = rotamer.rotamers_device(angles, bounds, 15)
        assert_array_equal(host, dev)


def test_all_rotamers_runs():
    # tiny dipeptide-like synthetic topology with chi-bearing residue
    from enspara_tpu.io.topology import Topology
    top = Topology()
    ch = top.add_chain()
    for ri in range(3):
        res = top.add_residue('LYS', ch, ri + 1)
        for name in ('N', 'CA', 'C', 'O', 'CB', 'CG', 'CD', 'CE',
                     'NZ'):
            top.add_atom(name, name[0], res)
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(50, top.n_atoms, 3)).astype(np.float32)
    trj = io.Trajectory(xyz, top)
    states, inds, n_states = rotamer.all_rotamers(trj)
    assert states.shape[0] == 50
    assert states.shape[1] == inds.shape[0] == n_states.shape[0]
    assert set(np.unique(n_states)) <= {2, 3}
    assert states.min() >= 0


def test_sasa_isolated_atom():
    xyz = np.zeros((1, 1, 3), dtype=np.float32)
    radii = np.array([0.15], dtype=np.float32)
    out = sasa.shrake_rupley((xyz, radii), probe_radius=0.14,
                             n_sphere_points=256)
    want = 4 * np.pi * (0.15 + 0.14) ** 2
    assert_allclose(out[0, 0], want, rtol=1e-5)


def test_sasa_buried_atom():
    # central atom fully enclosed by 6 overlapping neighbors
    centers = np.array([[0, 0, 0], [0.2, 0, 0], [-0.2, 0, 0],
                        [0, 0.2, 0], [0, -0.2, 0], [0, 0, 0.2],
                        [0, 0, -0.2]], dtype=np.float32)[None]
    radii = np.full(7, 0.2, dtype=np.float32)
    out = sasa.shrake_rupley((centers, radii), probe_radius=0.05,
                             n_sphere_points=256)
    assert out[0, 0] == 0.0


def test_sasa_matches_numpy_oracle():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(2, 12, 3)).astype(np.float32) * 0.3
    radii = np.full(12, 0.17, dtype=np.float32)
    dev = sasa.shrake_rupley((xyz, radii), probe_radius=0.14,
                             n_sphere_points=128)
    oracle = sasa.shrake_rupley_np(xyz, radii, probe_radius=0.14,
                                   n_sphere_points=128)
    assert_allclose(dev, oracle, rtol=1e-4, atol=1e-5)


def test_sasa_neighbor_list_exact():
    # a spread-out cloud where auto-K genuinely engages (K << A),
    # checked against the dense all-pairs path bit-for-bit
    rng = np.random.default_rng(7)
    A = 512
    R = (3 * A / (4 * np.pi * 116)) ** (1 / 3)  # protein density
    pts = rng.normal(size=(A, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= rng.random((A, 1)) ** (1 / 3) * R
    xyz = np.repeat(pts[None], 2, axis=0).astype(np.float32)
    xyz += rng.normal(scale=0.01, size=xyz.shape).astype(np.float32)
    radii = rng.uniform(0.12, 0.19, A).astype(np.float32)

    k = sasa._pick_n_neighbors(xyz, radii + 0.14, A, 64, 'auto')
    assert k is not None and k < A  # NL path actually exercised
    dense = sasa.shrake_rupley((xyz, radii), probe_radius=0.14,
                               n_sphere_points=120, n_neighbors=None)
    nl = sasa.shrake_rupley((xyz, radii), probe_radius=0.14,
                            n_sphere_points=120, n_neighbors='auto')
    assert_allclose(nl, dense, rtol=1e-5, atol=1e-6)


def _ala_traj(n_frames=4, n_res=5, seed=4):
    from enspara_tpu.io.topology import Topology
    top = Topology()
    ch = top.add_chain()
    for ri in range(n_res):
        res = top.add_residue('ALA', ch, ri + 1)
        for name in ('N', 'CA', 'C', 'O', 'CB'):
            top.add_atom(name, name[0], res)
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n_frames, top.n_atoms, 3)).astype(np.float32)
    return io.Trajectory(xyz, top)


def test_rmsf_zero_for_identical():
    trj = _ala_traj(1)
    trj4 = trj.join([trj.copy(), trj.copy(), trj.copy()])
    out = rmsf.rmsf_calc(trj4)
    assert_allclose(out, 0, atol=1e-5)
    per_atom = rmsf.rmsf_calc(trj4, per_residue=False)
    assert per_atom.shape == (trj.n_atoms,)


def test_rmsf_weighting():
    trj = _ala_traj(3)
    # all weight on the reference frame -> rmsf 0
    out = rmsf.rmsf_calc(trj, populations=[1.0, 0.0, 0.0], ref_frame=0)
    assert_allclose(out, 0, atol=1e-5)
    out2 = rmsf.rmsf_calc(trj, populations=[0.0, 1.0, 0.0])
    assert (out2 > 0).any()


def test_helix_vectors_ideal_helix():
    """An ideal helix along z must give vectors ~ +-z."""
    from enspara_tpu.io.topology import Topology
    n_res = 12
    top = Topology()
    ch = top.add_chain()
    coords = []
    for ri in range(n_res):
        res = top.add_residue('ALA', ch, ri + 1)
        for k, name in enumerate(('N', 'CA', 'C')):
            top.add_atom(name, name[0], res)
            t = ri * 3 + k
            theta = 2 * np.pi * t / 11.0
            coords.append([0.23 * np.cos(theta), 0.23 * np.sin(theta),
                           0.015 * t])
    xyz = np.array(coords, dtype=np.float32)[None]
    trj = io.Trajectory(xyz, top)
    vecs, centers = helix.calculate_piecewise_helix_vectors(
        trj, helix_start=1, helix_end=n_res)
    assert vecs.shape == (1, 3)
    assert abs(vecs[0, 2]) > 0.99
    hv, rv, cv, hc = helix.calculate_summary_helix_vectors(
        trj, [3, 6], helix_start=1, helix_end=n_res)
    # reference vectors orthogonal to the helix axis
    assert_allclose(np.einsum('rfk,fk->rf', rv, hv), 0, atol=1e-3)
    assert_allclose(np.linalg.norm(cv, axis=-1), 1, atol=1e-3)


def test_pockets_synthetic_cavity():
    """A shell of atoms with a hollow center must yield one pocket at
    the center."""
    from enspara_tpu.io.topology import Topology
    pts = []
    for x in (-0.4, 0.4):
        for y in (-0.4, 0.4):
            for z in (-0.4, 0.4):
                pts.append([x, y, z])
    for d in range(3):
        for s in (-0.45, 0.45):
            p = [0, 0, 0]
            p[d] = s
            pts.append(p)
    pts = np.array(pts, dtype=np.float32)
    top = Topology()
    ch = top.add_chain()
    res = top.add_residue('ALA', ch, 1)
    for _ in range(len(pts)):
        top.add_atom('C', 'C', res)
    struct = io.Trajectory(pts[None], top)

    cells = pockets.get_pocket_cells(struct, grid_spacing=0.1,
                                     probe_radius=0.07, min_rank=5)
    assert len(cells) > 0
    # the cavity center is among the pocket cells
    d_center = np.linalg.norm(cells, axis=1)
    assert d_center.min() < 0.12

    out = pockets.get_pockets(struct, grid_spacing=0.1,
                              probe_radius=0.07, min_rank=5,
                              n_procs=1)
    assert len(out) == 1
    assert out[0] is not None
    assert out[0].top.residue(0).name == 'POK'


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_exposons_end_to_end_real_structure():
    """Full exposons pipeline (SASA kernel -> sidechain condensation ->
    weighted MI -> AffinityPropagation) on the bundled beta-peptide."""
    from enspara_tpu.info_theory.exposons import exposons

    pdb = io.load(os.path.join(REF_DATA, 'beta-peptide.pdb'))
    trj = io.load(os.path.join(REF_DATA, 'beta-peptide.xtc'),
                  top=pdb.top)[:20]
    mi, labels = exposons(trj, damping=0.9, threshold=0.02)
    n_res = pdb.top.n_residues
    assert mi.shape == (n_res, n_res)
    assert labels.shape == (n_res,)
    assert np.allclose(mi, mi.T, atol=1e-10)


@pytest.mark.skipif(not HAVE_REF, reason='reference data not present')
def test_sasa_real_structure_magnitudes():
    """Per-residue SASA of the beta-peptide lands in the physically
    expected range (a few nm^2 per residue)."""
    pdb = io.load(os.path.join(REF_DATA, 'beta-peptide.pdb'))
    out = sasa.shrake_rupley(pdb, probe_radius=0.14,
                             n_sphere_points=256, mode='residue')
    assert out.shape == (1, pdb.top.n_residues)
    assert (out > 0).all()
    assert out.sum() < 100  # nm^2, sane total for a small peptide


def test_sasa_sharded_matches_single_device():
    from enspara_tpu.geometry.sasa import shrake_rupley
    from enspara_tpu.parallel import frame_mesh

    rng = np.random.default_rng(5)
    xyz = (rng.normal(size=(19, 12, 3)) * 0.3).astype(np.float32)
    radii = np.full(12, 0.15, np.float32)
    single = shrake_rupley((xyz, radii), probe_radius=0.28)
    sharded = shrake_rupley((xyz, radii), probe_radius=0.28,
                            mesh=frame_mesh())
    assert_allclose(sharded, single, rtol=1e-6)


@pytest.mark.skipif(
    not os.path.isdir('/root/reference/enspara/test/geometry_data'),
    reason='reference geometry data not present')
def test_all_rotamers_reference_protein():
    """The dihedral inventory on the reference's real protein matches
    its expected state counts (reference: test_rotamer.py
    test_rotamer_assignment: 18 two-state phi/psi + 21 three-state
    chi), and assignments are consistent under trajectory splitting."""
    G = '/root/reference/enspara/test/geometry_data'
    top = io.load(G + '/PROT_only.pdb')
    trj = io.load(G + '/trj0.xtc', top=top.top)

    states, inds, n_states = rotamer.all_rotamers(trj)
    assert_array_equal(n_states, np.array([2] * 18 + [3] * 21))
    assert states.dtype.kind == 'i'
    assert states.shape == (trj.n_frames, 39)

    # split-consistency (reference: test_rotamer_assignment_split)
    pivot = trj.n_frames // 2
    s1, i1, n1 = rotamer.all_rotamers(trj[:pivot])
    assert_array_equal(states[:pivot], s1)
    assert_array_equal(inds, i1)
    assert_array_equal(n_states, n1)
