"""Live-oracle parity for the point-cloud FRET dye stack.

The reference's ``dyes_from_expt_dist`` touches mdtraj only through
``md.load`` in ``load_dye``; patching that one call to our loader lets
the WHOLE reference pipeline — residue-frame rotation matrices,
Rodrigues rotation, CB reconstruction, steric pruning against the
protein, and the per-state dye-pair distance histograms — run on our
Trajectory objects as the oracle."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from _reference_oracle import load_reference
from enspara_tpu import io

FRET_DATA = '/root/reference/enspara/test/fret_data'
DYE_DIR = '/root/reference/enspara/data/dyes'

enspara_ref = load_reference()
HAVE_ALL = (enspara_ref is not None and os.path.isdir(FRET_DATA)
            and os.path.isdir(DYE_DIR))

if HAVE_ALL:
    import importlib
    import sys

    ref_dyes = importlib.import_module(
        'enspara.geometry.dyes_from_expt_dist')
    sys.modules['mdtraj'].load = io.load

pytestmark = pytest.mark.skipif(not HAVE_ALL,
                                reason='reference/dye data not present')


def fret_fn(fn):
    return os.path.join(FRET_DATA, fn)


# --- a picklable mdtraj-like view over our Trajectory: the reference
# reads a.element.radius, where our Atom.element is a plain symbol ----

class _ElView(object):
    def __init__(self, symbol):
        from enspara_tpu.io.topology import ELEMENT_RADII
        self.symbol = symbol
        self.radius = ELEMENT_RADII.get(symbol, 0.17)


class _AtomView(object):
    def __init__(self, atom, residue):
        self.name = atom.name
        self.index = atom.index
        self.element = _ElView(atom.element)
        self.residue = residue


class _ResView(object):
    def __init__(self, res):
        self.name = res.name
        self.resSeq = res.resSeq
        self.atoms = [_AtomView(a, self) for a in res._atoms] \
            if hasattr(res, '_atoms') else \
            [_AtomView(res.atom(i), self) for i in range(res.n_atoms)]


class _TopView(object):
    def __init__(self, top):
        self._top = top
        self.residues = [_ResView(r) for r in top.residues]
        self.atoms = [a for r in self.residues for a in r.atoms]
        self.n_atoms = top.n_atoms

    def select(self, expr):
        return self._top.select(expr)


class _TrajView(object):
    def __init__(self, traj, top_view=None):
        self._traj = traj
        self.xyz = traj.xyz
        self.top = top_view or _TopView(traj.topology)
        self.topology = self.top
        self.n_frames = traj.n_frames

    def __len__(self):
        return self.n_frames

    def __getitem__(self, i):
        return _TrajView(self._traj[i], self.top)

    def __iter__(self):
        return (self[i] for i in range(self.n_frames))


@pytest.fixture(scope='module')
def system():
    from enspara_tpu.geometry import dyes_from_expt_dist as ours

    return {
        # 2 frames keep the reference's per-frame pipeline (~1 min per
        # frame per pair) fast enough for the default suite
        'trj': io.load(fret_fn('ab40.xtc'), top=fret_fn('ab40.pdb'))[:2],
        'dye1': ours.load_dye(
            os.path.join(DYE_DIR, 'point-clouds', 'AF488.pdb')),
        'dye2': ours.load_dye(
            os.path.join(DYE_DIR, 'point-clouds', 'AF594.pdb')),
    }


def test_load_dye_matches_reference():
    from enspara_tpu.geometry import dyes_from_expt_dist as ours

    path = os.path.join(DYE_DIR, 'point-clouds', 'AF488.pdb')
    ref_dye = ref_dyes.load_dye(path)
    our_dye = ours.load_dye(path)
    assert_allclose(our_dye.xyz, ref_dye.xyz, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize('pair', [[1, 40]])
def test_dye_distance_distribution_matches_reference(system, pair):
    """Full per-frame pipeline: rotation frames, Rodrigues alignment,
    steric pruning, distance histograms."""
    from enspara_tpu.geometry import dyes_from_expt_dist as ours

    ref_probs, ref_edges = ref_dyes.dye_distance_distribution(
        _TrajView(system['trj']), _TrajView(system['dye1']),
        _TrajView(system['dye2']), pair, n_procs=1)
    our_probs, our_edges = ours.dye_distance_distribution(
        system['trj'], system['dye1'], system['dye2'], pair,
        n_procs=1)

    assert len(our_probs) == len(ref_probs)
    for i in range(len(ref_probs)):
        assert_allclose(np.asarray(our_probs[i]),
                        np.asarray(ref_probs[i]), atol=1e-6,
                        err_msg='frame %d probs' % i)
        assert_allclose(np.asarray(our_edges[i]),
                        np.asarray(ref_edges[i]), atol=1e-6,
                        err_msg='frame %d edges' % i)
