"""Live-oracle parity for RMSF and helix vectors: the reference's
implementations are duck-typed over ``trj.xyz`` / ``trj.topology``, so
they run directly on OUR Trajectory objects — no stubbing, the actual
reference code is the oracle (same strategy as the clustering/MSM fuzz
suites)."""

import copy

import numpy as np
import pytest
from numpy.testing import assert_allclose

from _reference_oracle import load_reference
from enspara_tpu import io
from enspara_tpu.io.topology import Topology

enspara_ref = load_reference()
if enspara_ref is not None:
    import importlib
    for _m in ('enspara.geometry.rmsf', 'enspara.geometry.helix'):
        importlib.import_module(_m)

pytestmark = pytest.mark.skipif(enspara_ref is None,
                                reason='reference not present')


def make_protein_traj(n_res, n_frames, seed, helical=False):
    """A Trajectory with N/CA/C/O per residue; optionally laid out on
    an ideal alpha-helix so the helix-axis math has signal."""
    top = Topology()
    chain = top.add_chain()
    rng = np.random.default_rng(seed)
    coords = []
    for r in range(n_res):
        res = top.add_residue('ALA', chain, resSeq=r + 1)
        # residues must have VARYING atom counts: the reference's
        # per-residue gather builds a ragged object array of index
        # lists (rmsf.py:47-49), and uniform rows would collapse it to
        # a 2-D object array that cannot index (a latent reference
        # limitation for perfectly uniform topologies)
        names = [('N', 'N'), ('CA', 'C'), ('C', 'C'), ('O', 'O')]
        names += [('CB', 'C')] * (r % 3)
        for name, el in names:
            top.add_atom(name, el, res)
        if helical:
            # ~100 deg turn and 0.15 nm rise per residue
            th = np.radians(100.0) * r
            base = np.array([0.23 * np.cos(th), 0.23 * np.sin(th),
                             0.15 * r])
            offs = [(0.05, 0, -0.04), (0, 0, 0), (0.06, 0.02, 0.04),
                    (0.1, 0.05, 0.05), (0.12, -0.03, 0.0),
                    (0.14, 0.0, -0.02)]
            for off in offs[:len(names)]:
                coords.append(base + off)
        else:
            base = rng.normal(size=3)
            for _ in range(len(names)):
                coords.append(base + 0.05 * rng.normal(size=3))
    xyz = np.tile(np.asarray(coords, np.float32), (n_frames, 1, 1))
    xyz = xyz + rng.normal(size=xyz.shape).astype(np.float32) * 0.03
    return io.Trajectory(xyz, top)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('per_residue', [True, False])
def test_rmsf_matches_reference(seed, per_residue):
    from enspara_tpu.geometry import rmsf as ours

    rng = np.random.default_rng(seed)
    trj = make_protein_traj(6, 10, seed)
    pops = rng.uniform(0.1, 1.0, 10)
    pops /= pops.sum()
    kwargs = dict(populations=pops, ref_frame=int(rng.integers(10)),
                  per_residue=per_residue)
    if seed == 2:
        kwargs['atom_indices'] = np.arange(0, trj.n_atoms, 2)

    # superpose mutates in place: give each implementation its own copy
    ref_out = enspara_ref.geometry.rmsf.rmsf_calc(
        copy.deepcopy(trj), **kwargs)
    our_out = ours.rmsf_calc(copy.deepcopy(trj), **kwargs)
    assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


def test_rmsf_defaults_match_reference():
    from enspara_tpu.geometry import rmsf as ours

    trj = make_protein_traj(5, 7, 11)
    ref_out = enspara_ref.geometry.rmsf.rmsf_calc(copy.deepcopy(trj))
    our_out = ours.rmsf_calc(copy.deepcopy(trj))
    assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('seed', [3, 4])
def test_piecewise_helix_vectors_match_reference(seed):
    from enspara_tpu.geometry import helix as ours

    trj = make_protein_traj(12, 4, seed, helical=True)
    res = dict(helix_resnums=np.arange(2, 11))
    ref_vec, ref_pts = (
        enspara_ref.geometry.helix.calculate_piecewise_helix_vectors(
            trj, **res))
    our_vec, our_pts = ours.calculate_piecewise_helix_vectors(
        trj, **res)
    assert_allclose(our_vec, ref_vec, rtol=1e-5, atol=1e-6)
    assert_allclose(our_pts, ref_pts, rtol=1e-5, atol=1e-6)


def test_summary_helix_vectors_match_reference():
    from enspara_tpu.geometry import helix as ours

    trj = make_protein_traj(12, 3, 9, helical=True)
    kwargs = dict(res_refs=np.array([3, 6, 9]),
                  helix_resnums=np.arange(2, 11))
    ref_out = enspara_ref.geometry.helix.calculate_summary_helix_vectors(
        trj, **kwargs)
    our_out = ours.calculate_summary_helix_vectors(trj, **kwargs)
    for a, b in zip(our_out, ref_out):
        assert_allclose(a, b, rtol=1e-5, atol=1e-6)
