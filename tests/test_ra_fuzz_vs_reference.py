"""Fuzz parity of RaggedArray indexing/operator semantics against the
reference implementation (enspara/ra/ra.py), imported directly from
/root/reference with its heavy I/O deps stubbed out. The reference's
test_ra.py is the de-facto RA spec; this fuzz sweeps a much larger
space of index expressions than its hand-written cases.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = '/root/reference'
HAVE_REF = os.path.isfile(os.path.join(REF_ROOT, 'enspara/ra/ra.py'))

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference tree not present')


@pytest.fixture(scope='module')
def ref_ra():
    for name in ('tables', 'mdtraj', 'mdtraj.io'):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules['mdtraj'].io = sys.modules['mdtraj.io']
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from enspara import ra as reference_ra
    return reference_ra


def _materialize(x):
    """Normalize RA / ndarray / scalar to comparable numpy form.

    Documented divergence: the reference's empty row-slice returns a
    degenerate RaggedArray with ``lengths=[]`` and NO ``_data``
    attribute (``.shape`` raises); ours returns a well-formed empty
    RA. Both normalize to ('RA', (), []).
    """
    if hasattr(x, 'lengths') and not hasattr(x, '_data') \
            and len(x.lengths) == 0:
        return ('RA', (), np.array([]))
    if hasattr(x, '_data') and hasattr(x, 'lengths'):
        return ('RA', tuple(int(v) for v in x.lengths),
                np.asarray(x._data))
    return ('ARR', None, np.asarray(x))


def _compare(ours, theirs, what):
    ok, ol, od = _materialize(ours)
    tk, tl, td = _materialize(theirs)
    assert ok == tk, '%s: kind %s vs %s' % (what, ok, tk)
    assert ol == tl, '%s: lengths %s vs %s' % (what, ol, tl)
    assert od.shape == td.shape, '%s: shape %s vs %s' % (what, od.shape,
                                                         td.shape)
    assert np.array_equal(od, td), what


def _apply(fn, *args):
    try:
        return fn(*args), None
    except Exception as e:   # noqa: BLE001 — parity includes raising
        return None, type(e).__name__


LENGTH_SETS = [
    [3, 7],
    [1, 1, 1],
    [5],
    [4, 0, 6],       # empty row
    [2, 9, 3, 5],
]


def _index_expressions(lengths, rng):
    n_rows = len(lengths)
    total = sum(lengths)
    exprs = [
        0, -1, n_rows - 1, -n_rows,
        slice(None), slice(1, None), slice(None, -1), slice(0, n_rows, 2),
        slice(None, None, -1),
        [0], list(range(n_rows)), [n_rows - 1, 0],
        np.arange(n_rows) % 2 == 0,               # row bool mask
    ]
    # (row, col) tuples incl. negatives and slices
    for _ in range(6):
        r = int(rng.integers(-n_rows, n_rows))
        L = lengths[r]
        if L > 0:
            exprs.append((r, int(rng.integers(-L, L))))
            exprs.append((r, slice(None)))
            exprs.append((r, slice(1, None)))
            exprs.append((r, slice(None, None, 2)))
    # out-of-range probes (both sides must raise)
    exprs.append(n_rows)
    exprs.append((0, lengths[0] + 2) if lengths[0] else (0, 1))
    # fancy (rows, cols) arrays
    rows, cols = [], []
    for i, L in enumerate(lengths):
        for j in range(L):
            rows.append(i)
            cols.append(j)
    if rows:
        pick = rng.integers(0, len(rows), size=min(5, len(rows)))
        exprs.append((np.asarray(rows)[pick], np.asarray(cols)[pick]))
    return exprs


@pytest.mark.parametrize('lengths', LENGTH_SETS,
                         ids=lambda L: 'x'.join(map(str, L)))
def test_getitem_fuzz(ref_ra, lengths):
    from enspara_tpu import ra as ours_ra

    rng = np.random.default_rng(hash(tuple(lengths)) % (2 ** 31))
    data = np.arange(sum(lengths))
    ours = ours_ra.RaggedArray(data.copy(), lengths=lengths)
    ref = ref_ra.RaggedArray(data.copy(), lengths=lengths)

    for expr in _index_expressions(lengths, rng):
        got, got_err = _apply(lambda: ours[expr])
        want, want_err = _apply(lambda: ref[expr])
        what = 'lengths=%s expr=%r' % (lengths, expr)
        assert (got_err is None) == (want_err is None), (
            '%s: ours %s, reference %s' % (what, got_err or 'ok',
                                           want_err or 'ok'))
        if got_err is None:
            _compare(got, want, what)


@pytest.mark.parametrize('lengths', LENGTH_SETS,
                         ids=lambda L: 'x'.join(map(str, L)))
def test_bool_mask_and_where_fuzz(ref_ra, lengths):
    from enspara_tpu import ra as ours_ra

    data = np.arange(sum(lengths))
    ours = ours_ra.RaggedArray(data.copy(), lengths=lengths)
    ref = ref_ra.RaggedArray(data.copy(), lengths=lengths)

    for thresh in (0, 3, sum(lengths) // 2, sum(lengths)):
        om, rm = ours > thresh, ref > thresh
        _compare(om, rm, 'mask >%d lengths=%s' % (thresh, lengths))
        got, got_err = _apply(lambda: ours[om])
        want, want_err = _apply(lambda: ref[rm])
        if want_err == 'IndexError' and not np.asarray(om._data).any():
            # documented divergence: the reference raises IndexError
            # on an EMPTY boolean-mask selection (np.where's empty
            # float64 output used as indices, ra.py:324); we return
            # an empty selection instead
            assert got_err is None and len(np.asarray(got)) == 0
        else:
            assert got_err == want_err, (got_err, want_err)
            if got_err is None:
                _compare(got, want,
                         'masked get >%d lengths=%s' % (thresh, lengths))
        ow = ours_ra.where(om)
        rw = ref_ra.where(rm)
        assert np.array_equal(ow[0], rw[0]) and np.array_equal(
            ow[1], rw[1]), 'where >%d lengths=%s' % (thresh, lengths)


@pytest.mark.parametrize('lengths', LENGTH_SETS,
                         ids=lambda L: 'x'.join(map(str, L)))
def test_operators_fuzz(ref_ra, lengths):
    from enspara_tpu import ra as ours_ra

    data = np.arange(1, sum(lengths) + 1)
    ours = ours_ra.RaggedArray(data.copy(), lengths=lengths)
    ref = ref_ra.RaggedArray(data.copy(), lengths=lengths)

    for op in ('__add__', '__sub__', '__mul__', '__floordiv__',
               '__pow__'):
        got, ge = _apply(lambda: getattr(ours, op)(2))
        want, we = _apply(lambda: getattr(ref, op)(2))
        assert (ge is None) == (we is None), (op, ge, we)
        if ge is None:
            _compare(got, want, 'op %s lengths=%s' % (op, lengths))
    # RA (+) RA
    _compare(ours + ours, ref + ref, 'RA+RA lengths=%s' % lengths)
    _compare(ours * ours, ref * ref, 'RA*RA lengths=%s' % lengths)


@pytest.mark.parametrize('lengths', [[3, 7], [2, 9, 3, 5]],
                         ids=lambda L: 'x'.join(map(str, L)))
def test_setitem_fuzz(ref_ra, lengths):
    from enspara_tpu import ra as ours_ra

    rng = np.random.default_rng(5)
    for trial in range(8):
        data = np.arange(sum(lengths))
        ours = ours_ra.RaggedArray(data.copy(), lengths=lengths)
        ref = ref_ra.RaggedArray(data.copy(), lengths=lengths)

        r = int(rng.integers(0, len(lengths)))
        L = lengths[r]
        kind = trial % 4
        if kind == 0:      # scalar element
            c = int(rng.integers(-L, L))
            ours[r, c] = -5
            ref[r, c] = -5
        elif kind == 1:    # whole row
            ours[r] = np.full(L, -7)
            ref[r] = np.full(L, -7)
        elif kind == 2:    # row col-slice
            ours[r, 1:] = -9
            ref[r, 1:] = -9
        else:              # boolean mask
            ours[ours > 4] = -1
            ref[ref > 4] = -1
        _compare(ours, ref,
                 'setitem trial=%d lengths=%s' % (trial, lengths))


def test_partition_helpers_match(ref_ra):
    from enspara_tpu import ra as ours_ra

    lengths = [3, 5, 2]
    flat = list(range(10))
    assert [list(x) for x in ours_ra.partition_list(flat, lengths)] == \
           [list(x) for x in ref_ra.partition_list(flat, lengths)]
    inds = [0, 4, 7, 9]
    assert ours_ra.partition_indices(inds, lengths) == \
        ref_ra.partition_indices(inds, lengths)
