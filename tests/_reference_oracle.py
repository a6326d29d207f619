"""Import the reference enspara (pure-Python parts) from
/root/reference as a live parity oracle, stubbing its uninstalled
binary deps (pytables, mdtraj, the Cython libmsm). The reference's own
``_prinz_mle_py`` mirror (builders.py:215) makes the whole MSM stack
importable without the Cython kernel."""

import os
import sys
import types

REF_ROOT = '/root/reference'

HAVE_REF = os.path.isfile(os.path.join(REF_ROOT, 'enspara/ra/ra.py'))


def load_reference():
    """Returns the reference's top-level ``enspara`` package, or None
    if /root/reference isn't present."""
    if not HAVE_REF:
        return None
    for name in ('tables', 'tables.exceptions', 'mdtraj', 'mdtraj.io'):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules['mdtraj'].io = sys.modules['mdtraj.io']
    sys.modules['tables'].exceptions = sys.modules['tables.exceptions']
    if not hasattr(sys.modules['tables.exceptions'], 'NoSuchNodeError'):
        class NoSuchNodeError(Exception):
            pass
        sys.modules['tables.exceptions'].NoSuchNodeError = \
            NoSuchNodeError
    if 'enspara.msm.libmsm' not in sys.modules:
        stub = types.ModuleType('enspara.msm.libmsm')

        def _mle_prinz_dense(*a, **k):
            raise NotImplementedError(
                'Cython kernel not built in the oracle tree; the '
                'reference mle() uses _prinz_mle_py instead')

        stub._mle_prinz_dense = _mle_prinz_dense
        sys.modules['enspara.msm.libmsm'] = stub
    if 'enspara.info_theory.libinfo' not in sys.modules:
        import numpy as np

        li = types.ModuleType('enspara.info_theory.libinfo')

        def bincount2d(x, y, n_x=None, n_y=None):
            # straightforward numpy stand-in for the Cython joint
            # histogram (libinfo.pyx:30) so the oracle's MI stack runs
            n_x = int(x.max()) + 1 if n_x is None else n_x
            n_y = int(y.max()) + 1 if n_y is None else n_y
            H = np.zeros((n_x, n_y), dtype=np.uint32)
            np.add.at(H, (np.asarray(x, int), np.asarray(y, int)), 1)
            return H

        def matrix_bincount2d(a, b, n_a, n_b):
            # signature matches libinfo.pyx:50 (a, b: (T, n_feat))
            jc = np.zeros((a.shape[1], b.shape[1], n_a, n_b),
                          dtype=np.uint32)
            for i in range(a.shape[1]):
                for j in range(b.shape[1]):
                    jc[i, j] = bincount2d(a[:, i], b[:, j], n_a, n_b)
            return jc

        li.bincount2d = bincount2d
        li.matrix_bincount2d = matrix_bincount2d
        sys.modules['enspara.info_theory.libinfo'] = li
    if 'enspara.geometry.libdist' not in sys.modules:
        import numpy as np

        ld = types.ModuleType('enspara.geometry.libdist')

        def _with_out(vals, out):
            # float64-out contract of libdist.pyx:44-72
            if out is None:
                return vals.astype(np.float64)
            out[:] = vals
            return out

        def euclidean(X, y, out=None):
            v = np.sqrt(((np.asarray(X, np.float64)
                          - np.asarray(y, np.float64)) ** 2).sum(-1))
            return _with_out(v, out)

        def manhattan(X, y, out=None):
            v = np.abs(np.asarray(X, np.float64)
                       - np.asarray(y, np.float64)).sum(-1)
            return _with_out(v, out)

        def hamming(X, y, out=None):
            v = (np.asarray(X) != np.asarray(y)).mean(-1)
            return _with_out(v, out)

        ld.euclidean = euclidean
        ld.manhattan = manhattan
        ld.hamming = hamming
        sys.modules['enspara.geometry.libdist'] = ld
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import enspara
    return enspara
