"""Live-oracle parity for LIGSITE-style pocket detection.

The reference's pockets module touches mdtraj only through a tiny
surface (element radii, a carbon-topology builder, `Trajectory(xyz,
top)`); a ~30-line fake of that surface makes the ENTIRE reference
algorithm — grid, protein-occupancy, 7-direction scans, hierarchical
cell clustering — runnable here as the oracle against our
implementation."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from _reference_oracle import load_reference
from enspara_tpu import io
from enspara_tpu.io.topology import ELEMENT_RADII, Topology

enspara_ref = load_reference()

if enspara_ref is not None:
    import sys

    class _FakeElement(object):
        def __init__(self, symbol):
            self.symbol = symbol
            self.radius = ELEMENT_RADII[symbol]

    class _FakeRes(object):
        def __init__(self, name, resSeq):
            self.name, self.resSeq = name, resSeq

    class _FakeAtom(object):
        def __init__(self, name, element, residue, index):
            self.name, self.element = name, element
            self.residue, self.index = residue, index

    class _FakeChain(object):
        pass

    class _FakeTop(object):
        def __init__(self):
            self.atoms = []
            self._residues = []

        def add_chain(self):
            return _FakeChain()

        def add_residue(self, name, chain, resSeq=0):
            res = _FakeRes(name, resSeq)
            self._residues.append(res)
            return res

        def add_atom(self, name, element, res):
            self.atoms.append(
                _FakeAtom(name, element, res, len(self.atoms)))

        @property
        def n_atoms(self):
            return len(self.atoms)

    class _FakeTraj(object):
        def __init__(self, xyz, top):
            xyz = np.asarray(xyz, np.float32)
            self.xyz = xyz[None] if xyz.ndim == 2 else xyz
            self.top = top

    _md = sys.modules['mdtraj']
    _md.element = type('E', (), {})()
    _md.element.carbon = _FakeElement('C')
    _md.Topology = _FakeTop
    _md.Trajectory = _FakeTraj

    import importlib
    ref_pockets = importlib.import_module('enspara.geometry.pockets')

pytestmark = pytest.mark.skipif(enspara_ref is None,
                                reason='reference not present')


def _fake_struct(xyz, elements):
    top = _FakeTop()
    top.add_chain()
    for el in elements:
        top.add_atom(el, _FakeElement(el), None)
    return _FakeTraj(xyz, top)


def _our_struct(xyz, elements):
    top = Topology()
    chain = top.add_chain()
    res = top.add_residue('ALA', chain, 1)
    for el in elements:
        top.add_atom(el, el, res)
    return io.Trajectory(xyz[None].astype(np.float32), top)


def _pocket_summary(p):
    """(sorted cell coordinates, residue grouping sizes) for one
    pockets trajectory, or None."""
    if p is None:
        return None
    xyz = np.asarray(p.xyz).reshape(-1, 3)
    order = np.lexsort(xyz.T)
    return np.round(xyz[order], 5)


def _shell_structure(seed, n_shell=60, r=0.8):
    """A hollowish shell of atoms with an interior cavity — guaranteed
    pocket signal — plus noise atoms outside."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_shell, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    shell = (pts * r).astype(np.float32)
    stray = rng.uniform(1.2, 1.6, size=(10, 3)).astype(np.float32)
    xyz = np.concatenate([shell, stray])
    elements = (['C', 'N', 'O', 'S'] * ((len(xyz) + 3) // 4))[:len(xyz)]
    return xyz, elements


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_pocket_cells_match_reference(seed):
    """get_pocket_cells: identical surviving grid cells."""
    from enspara_tpu.geometry import pockets as ours

    xyz, elements = _shell_structure(seed)
    kwargs = dict(grid_spacing=0.12, probe_radius=0.1,
                  min_rank=3 + (seed % 2))
    ref_cells = ref_pockets.get_pocket_cells(
        _fake_struct(xyz, elements), **kwargs)
    our_cells = ours.get_pocket_cells(
        _our_struct(xyz, elements), **kwargs)

    ref_sorted = np.round(
        np.asarray(ref_cells)[np.lexsort(np.asarray(ref_cells).T)], 5)
    our_sorted = np.round(
        np.asarray(our_cells)[np.lexsort(np.asarray(our_cells).T)], 5)
    assert_allclose(our_sorted, ref_sorted, atol=1e-5)


@pytest.mark.parametrize('seed', [0, 3])
def test_get_pockets_match_reference(seed):
    """Full per-frame pipeline incl. hierarchical cell clustering:
    same cells and same largest-to-smallest pocket sizes."""
    from enspara_tpu.geometry import pockets as ours

    xyz, elements = _shell_structure(seed)
    kwargs = dict(grid_spacing=0.12, probe_radius=0.1, min_rank=4,
                  min_cluster_size=2, n_procs=1)
    ref_out = ref_pockets.get_pockets(
        [_fake_struct(xyz, elements)], **kwargs)[0]
    our_out = ours.get_pockets(_our_struct(xyz, elements), **kwargs)[0]

    if ref_out is None:
        assert our_out is None or our_out.n_atoms == 0
        return
    assert_allclose(_pocket_summary(our_out), _pocket_summary(ref_out),
                    atol=1e-5)
    # pocket (residue) size distribution matches
    ref_sizes = sorted(np.bincount(
        [a.residue.resSeq for a in ref_out.top.atoms]).tolist())
    our_sizes = sorted(r.n_atoms for r in our_out.top.residues)
    assert [s for s in ref_sizes if s] == [s for s in our_sizes if s]
