"""Case-by-case port of the reference MI spec
(/root/reference/enspara/test/test_mutual_info.py) — the pinned-value
and input-polymorphy cases not already represented in
tests/test_info_theory.py. Completes the port-or-waive sweep for the
info-theory tier (docs/parity-checklist.md).
"""

import warnings

import numpy as np
import pytest
from numpy.testing import (assert_array_equal, assert_allclose,
                           assert_almost_equal)

from enspara_tpu import ra
from enspara_tpu.exception import DataInvalid
from enspara_tpu.info_theory import mutual_info

# analytic value behind the reference's pinned 0.86114: the diagonal of
# a channel-capacity-normalized MI over ints uniform on {1..4} with
# n_states=5 is H(X)/log(5) = log(4)/log(5); sampling at 30k frames
# lands within ~2e-3 of it
DIAG_UNIF4_OF5 = np.log(4) / np.log(5)


def _zero_mi_np(rng):
    data = rng.integers(1, 5, (3, 10000, 5))
    return data, [5] * 5


def _nonzero_mi_np(rng):
    a, n_states = _zero_mi_np(rng)
    a[:, :, -2] = a[:, :, -1]
    return a, n_states


def _as_ra(data):
    return ra.RaggedArray(array=np.concatenate(list(data)),
                          lengths=[10000, 8000, 12000])


def _variants(data):
    """np 3-D stack, RaggedArray, and list-of-2-D — the reference's
    three accepted input containers."""
    return [data, _as_ra(data), [row for row in data]]


def test_mi_to_apc_pinned():
    """(reference test_mutual_info.py:62)"""
    mi = np.array([[1.0, 0.5, 0.1],
                   [0.5, 0.7, 0.1],
                   [0.1, 0.1, 0.7]])
    apc = mutual_info.mi_to_apc(mi)
    expected_apc = np.array(
        [[0.1400, 0.0955, 0.0244],
         [0.0955, 0.0833, 0.0211],
         [0.0244, 0.0211, 0.0566]])
    assert_allclose(apc[0, 0], np.sum(mi[0, :] ** 2) / 9)
    assert_almost_equal(apc, expected_apc, decimal=4)


def test_check_feature_size():
    """(reference test_mutual_info.py:78)"""
    states_same = [np.zeros((2, 3)), np.zeros((2, 3))]
    mutual_info.check_features_states(states_same, [2, 2, 2])
    with pytest.raises(DataInvalid):
        mutual_info.check_features_states(states_same, [2, 2])

    # differing frame counts are fine
    mutual_info.check_features_states(
        [np.zeros((2, 3)), np.zeros((1, 3))], [2, 2, 2])

    # differing feature counts are not
    with pytest.raises(DataInvalid):
        mutual_info.check_features_states(
            [np.zeros((2, 2)), np.zeros((2, 3))], [3])


def test_symmetrical_mi_zero():
    """Independent uniform features: zero off-diagonal MI, capacity-
    normalized marginal entropy on the diagonal, for all three input
    containers (reference test_mutual_info.py:108)."""
    rng = np.random.default_rng(0)
    data, n_states = _zero_mi_np(rng)
    for a in _variants(data):
        mi = mutual_info.mi_matrix(a, a, n_states, n_states)
        assert_allclose(np.diag(mi), DIAG_UNIF4_OF5, atol=0.01)
        mi[np.diag_indices_from(mi)] = 0
        assert_allclose(mi, 0, atol=1e-3)


def test_asymmetrical_mi_zero():
    """(reference test_mutual_info.py:122)"""
    rng = np.random.default_rng(0)
    for a, b in zip(_variants(_zero_mi_np(rng)[0]),
                    _variants(_zero_mi_np(rng)[0])):
        mi = mutual_info.mi_matrix(a, b, [5] * 5, [5] * 5)
        assert_allclose(np.diag(mi), 0, atol=0.1)
        mi[np.diag_indices_from(mi)] = 0
        assert_allclose(mi, 0, atol=1e-3)


@pytest.mark.parametrize('shape_spec', ['list', 'int'])
def test_symmetrical_mi_nonzero(shape_spec):
    """Duplicated feature pops out at the marginal entropy; an int
    n_states broadcasts across features
    (reference test_mutual_info.py:138 and :157)."""
    rng = np.random.default_rng(0)
    data, n_states = _nonzero_mi_np(rng)
    if shape_spec == 'int':
        n_states = 5
    for a in _variants(data):
        mi = mutual_info.mi_matrix(a, a, n_states, n_states)
        assert_allclose(mi[-1, -2], DIAG_UNIF4_OF5, atol=3e-3)
        mi[-1, -2] = mi[-2, -1] = 0
        assert_allclose(np.diag(mi), DIAG_UNIF4_OF5, atol=0.01)
        mi[np.diag_indices_from(mi)] = 0
        assert_allclose(mi, 0, atol=1e-3)


def test_asymmetrical_mi_nonzero():
    """a[:, 0] copied from b[:, 3]: exactly one nonzero cell
    (reference test_mutual_info.py:176)."""
    rng = np.random.default_rng(0)
    a, n_a = _zero_mi_np(rng)
    b, n_b = _zero_mi_np(rng)
    a = [row for row in a]
    b = [row for row in b]
    for r_a, r_b in zip(a, b):
        r_a[:, 0] = r_b[:, 3]

    mi = mutual_info.mi_matrix(a, b, n_a, n_b)
    assert_allclose(mi[0, 3], DIAG_UNIF4_OF5, atol=3e-3)
    mi[3, 0] = mi[0, 3] = 0
    assert_allclose(mi, 0, atol=1e-2)


def test_joint_count_binning():
    """1-D trajectory inputs, inferred and explicit state counts
    (reference test_mutual_info.py:218)."""
    trj1 = np.array([1] * 3 + [2] * 6 + [1] * 6)
    trj2 = np.array([1] * 9 + [0] * 3 + [2] * 3)

    expected_jc = np.array([[0, 0, 0],
                            [3, 3, 3],
                            [0, 6, 0]])[None, None, ...]

    jc = mutual_info.joint_counts(trj1, trj2)
    assert_array_equal(jc, expected_jc)

    jc = mutual_info.joint_counts(trj1, trj2, 3, 3)
    assert_array_equal(jc, expected_jc)


def test_weighted_mi_pinned():
    """weighted_mi over unique rows + frequencies reproduces
    mi_matrix_serial over the expanded data
    (reference test_mutual_info.py:234)."""
    a = np.array([[0, 1, 1, 1, 0, 0, 1, 0],
                  [0, 1, 1, 1, 0, 0, 0, 0]]).T
    b = np.array([[0, 1, 1],
                  [0, 1, 0]]).T

    mi = mutual_info.mi_matrix_serial([a], [a], [2, 2], [2, 2])
    wmi = mutual_info.weighted_mi(b, [4 / 8, 3 / 8, 1 / 8])
    assert_allclose(wmi, mi, atol=1e-12)


def test_nmi_apc_zeros():
    """(reference test_mutual_info.py:248)"""
    mi = np.array([[1.7, 0.0],
                   [0.0, 1.7]])
    nmi_apc = mutual_info.mi_to_nmi_apc(mi)
    assert_almost_equal(nmi_apc, np.array([[0.575, 0.0],
                                           [0.0, 0.575]]), decimal=3)


def test_nmi_apc_nonzero():
    """(reference test_mutual_info.py:259)"""
    mi = np.array([[1.7, 0.2],
                   [0.2, 1.7]])
    nmi_apc = mutual_info.mi_to_nmi_apc(mi)
    assert_almost_equal(nmi_apc, np.array([[0.574, 0.005],
                                           [0.005, 0.574]]), decimal=2)


def test_nmi_pinned_and_h_marginal():
    """(reference test_mutual_info.py:272)"""
    mi = np.array([[1.0, 0.1],
                   [0.1, 1.0]])
    nmi = mutual_info.mi_to_nmi(mi)
    assert_allclose(nmi, np.array([[1.0, 0.052632],
                                   [0.052632, 1.0]]), rtol=1e-4)

    mi[0, 0] = mi[1, 1] = 0
    nmi2 = mutual_info.mi_to_nmi(mi, H_marginal=np.array([1, 1]))
    assert_allclose(nmi, nmi2)


def test_nmi_diagonal():
    """(reference test_mutual_info.py:291)"""
    mi = np.array([[1.7, 0.0],
                   [0.0, 1.7]])
    assert_allclose(mutual_info.mi_to_nmi(mi), np.diag([1.0, 1.0]))


def test_nmi_zerodiag():
    """Zero/negative diagonal entries warn but never produce NaN
    (reference test_mutual_info.py:301)."""
    mi = np.array([[0.0001, 0.1],
                   [0.1, -0.0]])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        nmi = mutual_info.mi_to_nmi(mi)
        assert len(w) > 0
    assert np.all(~np.isnan(nmi))


def test_network_deconvolution_closure():
    """Deconvolution recovers the direct network from its transitive
    closure (reference test_mutual_info.py:313)."""
    from numpy.linalg import matrix_power

    G_dir = np.array([[0.5, 0.4, 0.1],
                      [0.2, 0.7, 0.1],
                      [0.1, 0.2, 0.7]])
    G_obs = G_dir.copy()
    for i in range(2, 1000):
        G_obs += matrix_power(G_dir, i)

    assert_allclose(mutual_info.deconvolute_network(G_obs), G_dir,
                    atol=1e-3)
