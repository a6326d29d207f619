"""Case-by-case port of the reference entropy spec
(/root/reference/enspara/test/test_entropy.py): Q-from-assignments,
per-state and MSM relative entropies, and the kl_divergence base/
negative-probability contracts, all at the reference's pinned values.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal, assert_almost_equal

from enspara_tpu.exception import DataInvalid
from enspara_tpu.msm import builders
from enspara_tpu.info_theory.entropy import (
    Q_from_assignments, relative_entropy_per_state, relative_entropy_msm,
    kl_divergence)

ASSIGNMENTS = np.array(
    [[0, 1, 1, 0, 1, 0, 2, 2, 0, 1, 1, 1],
     [0, 2, 2, 1, 2, 0, 2, 1, 0, 1, 2, 1]])

RAW_Q = np.array(
    [[0., 0.57142857, 0.42857143],
     [0.375, 0.375, 0.25],
     [0.28571429, 0.42857143, 0.28571429]])

Q_WITH_PRIOR = np.array(
    [[0.00636943, 0.56687898, 0.42675159],
     [0.37430168, 0.37430168, 0.25139665],
     [0.2866242, 0.42675159, 0.2866242]])

Q_TRANSPOSE_W_PRIOR = np.array(
    [[0.00740741, 0.57777778, 0.41481481],
     [0.3880597, 0.33333333, 0.27860697],
     [0.3566879, 0.3566879, 0.2866242]])

P_TEST = np.array(
    [[0.5, 0.5, 0],
     [0.25, 0.25, 0.5],
     [0, 0.25, 0.75]])


def test_Q_from_assignments():
    """(reference test_entropy.py:13)"""
    assert_array_almost_equal(
        Q_from_assignments(ASSIGNMENTS, prior_counts=0), RAW_Q, 7)
    assert_array_almost_equal(
        Q_from_assignments(ASSIGNMENTS), Q_WITH_PRIOR, 7)
    assert_array_almost_equal(
        Q_from_assignments(ASSIGNMENTS, builder=builders.transpose),
        Q_TRANSPOSE_W_PRIOR, 7)


def test_relative_entropy_per_state():
    """(reference test_entropy.py:51)"""
    rel_ent_without_prior = np.array([np.inf, 0.20751875, 0.84983615])
    rel_ent_with_prior = np.array([3.05675367, 0.20484462, 0.84793052])
    rel_ent_transpose_with_prior = np.array(
        [2.9341145, 0.15950137, 0.91261408])

    assert_array_almost_equal(
        relative_entropy_per_state(
            P_TEST, assignments=ASSIGNMENTS, prior_counts=0),
        rel_ent_without_prior, 6)
    assert_array_almost_equal(
        relative_entropy_per_state(P_TEST, assignments=ASSIGNMENTS),
        rel_ent_with_prior, 6)
    assert_array_almost_equal(
        relative_entropy_per_state(
            P_TEST, assignments=ASSIGNMENTS,
            builder=builders.transpose),
        rel_ent_transpose_with_prior, 6)

    assert_array_almost_equal(
        relative_entropy_per_state(P_TEST, Q=RAW_Q),
        rel_ent_without_prior, 6)
    assert_array_almost_equal(
        relative_entropy_per_state(P_TEST, Q=Q_WITH_PRIOR),
        rel_ent_with_prior, 6)
    assert_array_almost_equal(
        relative_entropy_per_state(P_TEST, Q=Q_TRANSPOSE_W_PRIOR),
        rel_ent_transpose_with_prior, 6)


def test_relative_entropy_msm():
    """(reference test_entropy.py:114)"""
    assert_almost_equal(
        relative_entropy_msm(
            P_TEST, assignments=ASSIGNMENTS, prior_counts=0),
        np.inf, 7)
    assert_almost_equal(
        relative_entropy_msm(P_TEST, assignments=ASSIGNMENTS),
        0.979737855, 7)
    assert_almost_equal(
        relative_entropy_msm(
            P_TEST, assignments=ASSIGNMENTS,
            builder=builders.transpose),
        0.98622475852, 7)

    assert_almost_equal(
        relative_entropy_msm(P_TEST, Q=RAW_Q), np.inf, 7)
    assert_almost_equal(
        relative_entropy_msm(P_TEST, Q=Q_WITH_PRIOR), 0.979737855, 7)
    assert_almost_equal(
        relative_entropy_msm(P_TEST, Q=Q_TRANSPOSE_W_PRIOR),
        0.98622475852, 7)


def test_kl_divergence_bases():
    """Matrix and per-row divergences in bases 2, e, 10
    (reference test_entropy.py:174)."""
    Q_test = np.array(
        [[0.25, 0.25, 0.5],
         [0.25, 0.25, 0.5],
         [0.1, 0.65, 0.25]])

    true_base_2 = np.array([1., 0.0, 0.84409397])
    true_base_e = np.array([0.6931472, 0.0, 0.58508136])
    true_base_10 = np.array([0.3010299957, 0.0, 0.25409760])

    assert_array_almost_equal(true_base_2,
                              kl_divergence(P_TEST, Q_test), 7)
    assert_array_almost_equal(true_base_e,
                              kl_divergence(P_TEST, Q_test, base=np.e), 7)
    assert_array_almost_equal(true_base_10,
                              kl_divergence(P_TEST, Q_test, base=10), 7)

    for r in range(3):
        assert_almost_equal(
            true_base_2[r], kl_divergence(P_TEST[r], Q_test[r]), 7)
        assert_almost_equal(
            true_base_e[r],
            kl_divergence(P_TEST[r], Q_test[r], base=np.e), 7)
        assert_almost_equal(
            true_base_10[r],
            kl_divergence(P_TEST[r], Q_test[r], base=10), 7)


def test_kl_divergence_negative_probs():
    """(reference test_entropy.py:241)"""
    Q_test = np.array(
        [[0.25, 0.25, 0.5],
         [0.25, 0.25, 0.5],
         [0.1, 0.65, 0.25]])

    with pytest.raises(DataInvalid):
        P_neg = np.copy(P_TEST)
        P_neg[0, 1] *= -1
        kl_divergence(P_neg, Q_test)

    with pytest.raises(DataInvalid):
        Q_neg = np.copy(Q_test)
        Q_neg[0, 1] *= -1
        kl_divergence(P_TEST, Q_neg)
