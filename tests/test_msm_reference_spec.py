"""Case-by-case port of the reference MSM function spec
(/root/reference/enspara/test/test_msm_funcs.py, test_msm_obj.py,
test_msm_libmsm.py, test_msm_bootstrap.py) — the cases NOT already
represented in tests/test_msm.py's goldens. Together with that file
this closes the port-or-waive sweep for the reference's MSM tier (see
docs/parity-checklist.md).
"""

import warnings

import numpy as np
import pytest
import scipy.sparse
from numpy.testing import assert_array_equal, assert_allclose

from enspara_tpu.msm import builders
from enspara_tpu.msm.transition_matrices import (
    assigns_to_counts, eigenspectrum, trim_disconnected, TrimMapping)
from enspara_tpu.msm.timescales import implied_timescales

# the reference's full container-support contract
# (test_msm_funcs.py:19-23)
ARR_TYPES = [
    np.array, scipy.sparse.lil_matrix, scipy.sparse.csr_matrix,
    scipy.sparse.coo_matrix, scipy.sparse.csc_matrix,
    scipy.sparse.dia_matrix, scipy.sparse.dok_matrix,
]

ASSIGNS = np.array(
    [([0] * 30 + [1] * 20 + [-1] * 10),
     ([2] * 20 + [-1] * 5 + [1] * 35),
     ([0] * 10 + [1] * 30 + [2] * 19 + [3])])


def test_trim_mapping_construction():
    """to_original and to_mapped dict assignment are inverse views
    (reference test_msm_funcs.py:26)."""
    tm1 = TrimMapping()
    tm1.to_original = {0: 0, 1: 1, 2: 3, 3: 7}

    tm2 = TrimMapping()
    tm2.to_mapped = {0: 0, 1: 1, 3: 2, 7: 3}

    assert tm1 == tm2


def test_trim_mapping_write_read_bytes(tmp_path):
    """Exact CSV byte contract incl. -1 rows, via the file-object
    write/read API (reference test_msm_funcs.py:37)."""
    tm = TrimMapping([(0, 0), (1, -1), (2, 1), (3, 2)])

    fn = str(tmp_path / 'tm.csv')
    with open(fn, 'w') as f:
        tm.write(f)
    with open(fn) as f2:
        assert (f2.read().split('\n') ==
                ['original,mapped', '0,0', '1,-1', '2,1', '3,2', ''])
    with open(fn) as f2:
        assert TrimMapping.read(f2) == tm

    tm.save(fn)
    assert TrimMapping.load(fn) == tm


def test_implied_timescales_n_times_shape():
    """n_times > 1 widens the output to (n_lags, n_times)
    (reference test_msm_funcs.py:87-93)."""
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        tscales = implied_timescales(
            ASSIGNS, lag_times=range(1, 5), method=builders.transpose,
            trim=False, n_times=3)
    assert tscales.shape == (4, 3)


def test_eigenspectrum_types():
    """eigenspectrum accepts every supported container type and
    reproduces the reference's pinned 3-state spectrum
    (reference test_msm_funcs.py:96)."""
    expected_vals = np.array([1., 0.56457513, 0.03542487])
    expected_vecs = np.array(
        [[0.33333333,  0.8051731, -0.13550992],
         [0.33333333, -0.51994159, -0.62954540],
         [0.33333333, -0.28523152,  0.76505532]])

    for arr_type in ARR_TYPES:
        probs = arr_type(
            [[0.7, 0.1, 0.2],
             [0.1, 0.5, 0.4],
             [0.2, 0.4, 0.4]])
        e_vals, e_vecs = eigenspectrum(probs)
        # eigenvector sign is solver-arbitrary per column (the leading
        # one is pinned by the unit-mass normalization)
        signs = np.sign(e_vecs[0] * expected_vecs[0])
        assert_allclose(e_vecs * signs, expected_vecs, atol=1e-8,
                        err_msg='failed on type %r' % (arr_type,))
        assert_allclose(e_vals, expected_vals, atol=1e-8)


def test_assigns_to_counts_negnums():
    """-1 frames are dropped (transitions bridge the gap), matching the
    reference's pinned counts (reference test_msm_funcs.py:120)."""
    in_m = np.array(
        [[0, 2,  0, -1],
         [1, 2, -1, -1],
         [1, 0,  0, 1]])

    counts = assigns_to_counts(in_m, lag_time=1)

    expected = np.array([[1, 1, 1],
                         [1, 0, 1],
                         [1, 0, 0]])
    assert_array_equal(counts.toarray(), expected)


@pytest.mark.parametrize('calculate_eq_probs', [True, False])
@pytest.mark.parametrize('arr_type', ARR_TYPES)
def test_normalize_types(arr_type, calculate_eq_probs):
    """normalize is container-polymorphic over the full type list
    (reference test_msm_funcs.py:157)."""
    in_cts = arr_type([[0, 2, 8],
                       [4, 2, 4],
                       [7, 3, 0]])
    _, out_probs, _ = builders.normalize(
        in_cts, calculate_eq_probs=calculate_eq_probs)
    assert type(in_cts) is type(out_probs)

    if scipy.sparse.issparse(out_probs):
        out_probs = out_probs.toarray()
    expected = np.array([[0.0, 0.2, 0.8],
                         [0.4, 0.2, 0.4],
                         [0.7, 0.3, 0.0]])
    assert_array_equal(np.round(out_probs, decimals=1), expected)


@pytest.mark.parametrize('calculate_eq_probs', [True, False])
@pytest.mark.parametrize('arr_type', ARR_TYPES)
def test_transpose_types(arr_type, calculate_eq_probs):
    """(reference test_msm_funcs.py:191)"""
    in_cts = arr_type([[0, 2, 8],
                       [4, 2, 4],
                       [7, 3, 0]])
    _, out_probs, _ = builders.transpose(
        in_cts, calculate_eq_probs=calculate_eq_probs)
    assert type(in_cts) is type(out_probs)

    if scipy.sparse.issparse(out_probs):
        out_probs = out_probs.toarray()
    expected = np.array([[0.0, 0.3, 0.7],
                         [0.4, 0.2, 0.4],
                         [0.7, 0.3, 0.0]])
    assert_array_equal(np.round(out_probs, decimals=1), expected)


@pytest.mark.parametrize('calculate_eq_probs', [True, False])
@pytest.mark.parametrize('arr_type', ARR_TYPES)
def test_mle_types(arr_type, calculate_eq_probs):
    """(reference test_msm_funcs.py:225)"""
    in_cts = arr_type([[0, 2, 8],
                       [4, 2, 4],
                       [7, 3, 0]])
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        _, out_probs, _ = builders.mle(
            in_cts, calculate_eq_probs=calculate_eq_probs)
    assert type(in_cts) is type(out_probs)

    if scipy.sparse.issparse(out_probs):
        out_probs = out_probs.toarray()
    expected = np.array([[0.0, 0.2, 0.8],
                         [0.4, 0.2, 0.4],
                         [0.7, 0.3, 0.0]])
    assert_array_equal(np.round(out_probs, decimals=1), expected)


def test_mle_prior_not_in_place():
    """prior_counts returns a NEW counts array (input untouched) whose
    value is input+prior (reference test_msm_funcs.py:261)."""
    in_cts = np.array([[0, 2, 8],
                       [4, 2, 4],
                       [7, 3, 0]])
    in_cts_original = in_cts.copy()

    out_cts, _, _ = builders.mle(in_cts, prior_counts=10)
    assert_array_equal(out_cts, in_cts_original + 10)
    assert_array_equal(in_cts, in_cts_original)


def test_trim_disconnected_types_and_threshold():
    """trim_disconnected keeps the container type, renumbers, and
    honors threshold (reference test_msm_funcs.py:273)."""
    for arr_type in ARR_TYPES:
        given = arr_type([[1, 2, 0, 0],
                          [2, 1, 0, 1],
                          [0, 0, 1, 0],
                          [0, 1, 0, 2]])

        mapping, trimmed = trim_disconnected(given)
        assert type(trimmed) is type(given)

        expected_tcounts = np.array([[1, 2, 0],
                                     [2, 1, 1],
                                     [0, 1, 2]])
        if scipy.sparse.issparse(trimmed):
            trimmed = trimmed.toarray()
        assert_array_equal(trimmed, expected_tcounts)
        assert mapping == TrimMapping([(0, 0), (1, 1), (3, 2)])

        mapping, trimmed = trim_disconnected(given, threshold=2)
        if scipy.sparse.issparse(trimmed):
            trimmed = trimmed.toarray()
        assert_array_equal(trimmed, np.array([[1, 2], [2, 1]]))
        assert mapping == TrimMapping([(0, 0), (1, 1)])


def test_prior_counts_normalize_transpose():
    """prior_counts adds uniformly for normalize and transpose, dense
    and sparse (reference test_msm_funcs.py:313)."""
    given = np.array([[1, 2, 0, 0],
                      [2, 1, 0, 1],
                      [0, 0, 1, 0],
                      [0, 1, 0, 2]])
    prior = 1
    expected_counts = given + prior

    calculated_counts, _, _ = builders.normalize(
        given, prior_counts=prior, calculate_eq_probs=False)
    assert_array_equal(np.asarray(calculated_counts), expected_counts)

    calculated_counts, _, _ = builders.transpose(
        given, prior_counts=prior, calculate_eq_probs=False)
    assert_array_equal(np.asarray(calculated_counts), expected_counts)

    rows, cols = np.nonzero(given)
    sparse_counts = scipy.sparse.coo_matrix(
        (given[rows, cols], (rows, cols)), shape=given.shape)
    calculated_counts, _, _ = builders.normalize(
        sparse_counts, prior_counts=prior, calculate_eq_probs=False)
    got = calculated_counts.toarray() \
        if scipy.sparse.issparse(calculated_counts) \
        else np.asarray(calculated_counts)
    assert_array_equal(got, expected_counts)
